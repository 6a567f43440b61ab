from .taps import (BinaryFileTap, CascalogTap, CsvTap, JsonTap, MemoryTap,
                   ParquetTap, StdoutSink, TextLineTap, hfs_tap, lfs_tap)
