from .multigroup import multigroup, multigroup_n
