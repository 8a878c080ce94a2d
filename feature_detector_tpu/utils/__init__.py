from .log import report_debug, report_error, report_info, report_text, report_warn
from .timer import TickTock, time_jitted
