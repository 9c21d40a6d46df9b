from . import checkpoint, metrics, timing
from .debug import debug_print, is_debug, set_debug
