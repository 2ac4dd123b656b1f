"""qalsh_spark — a from-scratch PySpark-native near-duplicate detection and
clustering engine with the query/data-processing capabilities of the reference
QALSH engine (HuangQiang/QALSH, /root/reference), reimagined per SURVEY.md:

QALSH's query-aware LSH projection + B+-tree bucket probe + collision-count
candidate filter (reference: methods/qalsh.h:118-120, 386-495) becomes
set-similarity LSH over documents: vectorized MinHash/SimHash signatures,
band hashing into bounded groupBy buckets, collision-verified candidate pairs,
and connected-components clustering via iterative DataFrame self-joins, plus a
content-defined-anchor suffix pass for exact substring duplicates.

Everything is DataFrame-first: Catalyst plans the joins/aggregations; Python
only runs inside Arrow-batched pandas UDFs (no per-row Python).
"""

from qalsh_spark.config import DedupConfig
from qalsh_spark.session import get_spark

__all__ = ["DedupConfig", "get_spark"]
__version__ = "0.1.0"
