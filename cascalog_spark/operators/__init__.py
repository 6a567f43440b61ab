from .asof import asof_join
from .multigroup import multigroup, multigroup_n
