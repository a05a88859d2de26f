from .embeddings import (  # noqa: F401
    clustered_embeddings_path,
    ensure_clustered_embeddings,
)
from .transcripts import (  # noqa: F401
    TranscriptConfig,
    ensure_transcripts,
    generate_transcripts,
    sf_from_dir,
    transcripts_path,
)
