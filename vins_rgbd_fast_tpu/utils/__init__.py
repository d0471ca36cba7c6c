from . import quaternion
from .timing import StageTimer
