from .stateful import running_counts, stateful_op
from .stream import (session_windows, sliding_counts, stage_file_batches,
                     stream_dedup, stream_interval_join, stream_tap,
                     stream_to_memory, trapped_stream_map, tumbling_agg,
                     write_stream, write_stream_to_tap,
                     write_stream_trapped)
