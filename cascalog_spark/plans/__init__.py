from .checkpoint import Workflow
from .inspect import scan_report
from .stats import (counter, execute_with_stats, observed_stats,
                    with_job_conf)
