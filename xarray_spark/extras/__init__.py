"""Engine extensions beyond the reference: large-scale training-data
pipeline operators (dedup, similarity search, text analysis, multimodal).

These have no xarray equivalent — they exist because the engine targets
100 TB document/embedding corpora (BASELINE.json north star).
"""

from xarray_spark.extras import (  # noqa: F401
    curation,
    dedup,
    multimodal,
    portable,
    sampling,
    similarity,
    text,
)
