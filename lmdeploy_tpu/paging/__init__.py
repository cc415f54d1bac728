from .block_manager import BlockManager  # noqa: F401
from .scheduler import Scheduler, SchedulerOutput  # noqa: F401
from .seq import MessageStatus, SchedulerSequence, SchedulerSession, SequenceManager  # noqa: F401
