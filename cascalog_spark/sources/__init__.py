from .taps import (BinaryFileTap, BucketedTap, CascalogTap, CsvTap,
                   DecodedTap, FixedWidthTap, JdbcTap, JsonTap,
                   MemoryTap, OrcTap,
                   ParquetTap, RangePartitionedTap,
                   SequenceFileTap, StdoutSink, TextLineTap, hfs_tap, lfs_tap)
