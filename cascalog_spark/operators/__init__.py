from .multigroup import multigroup
