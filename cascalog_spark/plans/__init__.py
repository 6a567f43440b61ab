from .checkpoint import Workflow
from .stats import counter, execute_with_stats
