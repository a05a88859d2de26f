from .transcripts_source import (  # noqa: F401
    TRANSCRIPTS_SCHEMA,
    read_transcripts,
    read_transcripts_stream,
)
