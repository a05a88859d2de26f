from .transcripts_source import (  # noqa: F401
    TRANSCRIPTS_SCHEMA,
    read_transcripts,
    read_transcripts_stream,
)
from .partitioned import (  # noqa: F401
    read_silver_partitioned,
    with_silver_partitions,
    write_gold_partitioned,
    write_silver_partitioned,
)
