from .taps import (BinaryFileTap, BucketedTap, CascalogTap, CsvTap, JsonTap,
                   MemoryTap, ParquetTap, StdoutSink, TextLineTap, hfs_tap,
                   lfs_tap)
