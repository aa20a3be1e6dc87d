"""Query templates: pre-built pipelines for the benchmark workloads.

The "model zoo" of a query engine is its canonical query shapes — the
BASELINE configs and TPC-H-style queries, packaged as reusable builders
over the fluent Query API and the compiled executor. Used by benchmarks
and as executable documentation of end-to-end composition.
"""

from .tpch import (q1_pricing_summary, q3_shipping_priority,  # noqa: F401
                   q5_local_supplier_volume, q6_forecast)
from .baseline import (baseline_filter_project, baseline_group_by,  # noqa: F401
                       baseline_join, baseline_sort)
