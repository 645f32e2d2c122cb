"""Query/oracle registry: every implemented query as a
``(spark, sf_dir) -> DataFrame`` callable plus its DuckDB oracle SQL,
split by domain:

- ``ifs``    — the reference's feature/row-selection surface
- ``dedup``  — dedup & decontamination (exact … embedding-LSH)
- ``sim``    — embedding similarity / ANN / linear algebra
- ``events`` — event analytics & streaming parity
- ``tpch``   — TPC-H-shaped relational analytics
- ``sketch`` — HLL / CMS / histogram sketches
- ``text``   — text statistics, sampling, BPE, composite pipelines

``QUERIES``/``ORACLES`` preserve the exact key order of the pre-split
single-file registry (``_order.ORDER``): the driver's correctness gate
windows the FIRST 50 entries, so order is contract, not style. Four
queries share or alias another query's oracle builder (the maps below).
"""

from spark_ifs_spark.registry._common import *  # noqa: F401,F403
from spark_ifs_spark.registry.ifs import *  # noqa: F401,F403
from spark_ifs_spark.registry.dedup import *  # noqa: F401,F403
from spark_ifs_spark.registry.sim import *  # noqa: F401,F403
from spark_ifs_spark.registry.events import *  # noqa: F401,F403
from spark_ifs_spark.registry.tpch import *  # noqa: F401,F403
from spark_ifs_spark.registry.sketch import *  # noqa: F401,F403
from spark_ifs_spark.registry.text import *  # noqa: F401,F403

# NOTE: deliberately no `from . import dedup` etc. — the submodule
# names would shadow the operators-package aliases (`dedup`,
# `similarity`, ...) that _common's star export provides.
from spark_ifs_spark.registry._order import ORDER

_Q_ALIASES = {'bpe_train_merges': 'q_bpe_train'}
_O_ALIASES = {'bpe_train_merges': 'sql_bpe_train', 'docs_length_deciles': 'sql_docs_length_deciles_full', 'row_select_k5': 'sql_mrmr_select_k5', 'dedup_embedding_bucketed': 'sql_dedup_embedding', 'heavy_hitter_cross_audit': 'sql_cms_heavy_hitters'}

_NS = globals()
QUERIES = {k: _NS[_Q_ALIASES.get(k, f"q_{k}")] for k in ORDER}
ORACLES = {k: _NS[_O_ALIASES.get(k, f"sql_{k}")]() for k in ORDER}
