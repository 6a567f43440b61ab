from .asof import asof_join
from .multigroup import multigroup, multigroup_n
from .range_join import interval_overlap_join, range_join
from .scd2 import scd2_history, scd2_merge
from .diff import table_diff
from .merge import (MergeTap, apply_changes, apply_changes_into,
                    merge_frames, merge_into, optimize_table)
