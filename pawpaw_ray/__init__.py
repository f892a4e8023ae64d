"""pawpaw_ray — a Ray-Data-native text-segmentation / KG-construction engine.

Re-expresses the capabilities of the reference library ``rlayers/pawpaw``
(text → indexed-substring span trees → pipelines → queries) as idiomatic
Ray Data: ``ray.data.Dataset`` pipelines of ``map_batches`` transforms over
zero-copy Arrow batches, actor pools for stateful stages (entity linking),
``groupby``/``sort`` shuffles for canonicalization / conversation ordering,
and partitioned-Parquet sinks with per-partition lineage manifests.

Layout:
  kernels/    pure-Python/regex span algebra + NLP kernels (no Ray imports)
  stages/     batch transforms (map_batches UDFs and actor classes)
  sources/    readers (parquet transcripts, documents)
  pipelines/  end-to-end composed pipelines (KG construction)
  state/      lineage manifests, checkpoint/resume helpers
  datagen.py  deterministic synthetic transcript / alias-catalog generator
"""

__version__ = "0.1.0"

from pawpaw_ray.kernels.spans import (  # noqa: F401
    Retention,
    extract,
    nest_match,
    preferred_group_keys,
    split_by_boundaries,
    split_spans,
    gaps,
)
from pawpaw_ray.kernels import nlp  # noqa: F401
