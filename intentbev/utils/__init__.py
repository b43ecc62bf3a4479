from .native import NATIVE_AVAILABLE, native_lib
from .profiling import StepTimer, trace_context

__all__ = ["NATIVE_AVAILABLE", "native_lib", "StepTimer", "trace_context"]
