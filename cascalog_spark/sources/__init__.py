from .taps import (BinaryFileTap, BucketedTap, CascalogTap, CsvTap, JdbcTap,
                   JsonTap, MemoryTap, ParquetTap, StdoutSink, TextLineTap,
                   hfs_tap, lfs_tap)
