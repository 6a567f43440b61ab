from .ingest import (compact_ingest_index, compact_rollup,
                     compact_semantic_reps, ingest_batch_near_dedup,
                     read_ingest_corpus, read_ingest_index, read_rollup,
                     prune_state_snapshots,
                     read_funnel_state, read_retention, read_semantic_reps,
                     stream_retention_maintenance,
                     read_transition_counts, stream_transition_maintenance,
                     stream_funnel_maintenance,
                     stream_semantic_dedup_ingest,
                     stream_drift_monitor, stream_expectation_gate,
                     stream_near_dedup_ingest, stream_novelty_ingest,
                     stream_rollup_maintenance)
from .stateful import (latest_bucket_summary, running_counts, stateful_op,
                       stream_frequent_items)
from .stream import (session_windows, sliding_counts, stage_file_batches,
                     stream_dedup, stream_interval_join, stream_tap,
                     stream_to_memory, trapped_stream_map, tumbling_agg,
                     write_stream, write_stream_to_tap,
                     write_stream_trapped)
