from .accumulator import Accumulator
from .pipeline import LioPipeline, OdometryResult, StepRecord

__all__ = ["Accumulator", "LioPipeline", "OdometryResult", "StepRecord"]
