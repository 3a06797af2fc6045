from cover_vla_tpu.engine.verified_step import (
    make_verified_step, VerifiedStepResult)
from cover_vla_tpu.engine.cover_engine import CoVerEngine, StepRecord
