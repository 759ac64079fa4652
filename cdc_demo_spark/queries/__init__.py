"""The registered query surface.

Importing this package populates the registry with every implemented
query/operator from SURVEY.md §2 (each paired, where SQL-expressible,
with a DuckDB oracle for the driver's differential check).
"""

from cdc_demo_spark.queries.registry import QUERIES, ORACLES, register  # noqa: F401

# Import for side effect: each module registers its queries.
from cdc_demo_spark.queries import relational  # noqa: F401,E402
from cdc_demo_spark.queries import windows  # noqa: F401,E402
from cdc_demo_spark.queries import scalars  # noqa: F401,E402
from cdc_demo_spark.queries import dedup  # noqa: F401,E402
from cdc_demo_spark.queries import similarity  # noqa: F401,E402
from cdc_demo_spark.queries import textops  # noqa: F401,E402
from cdc_demo_spark.queries import cdc  # noqa: F401,E402
from cdc_demo_spark.queries import streamlike  # noqa: F401,E402
from cdc_demo_spark.queries import multimodal  # noqa: F401,E402
from cdc_demo_spark.queries import setops_extra  # noqa: F401,E402
from cdc_demo_spark.queries import reshaping  # noqa: F401,E402
from cdc_demo_spark.queries import tpch_like  # noqa: F401,E402
from cdc_demo_spark.queries import quality  # noqa: F401,E402
