"""Execution layer: push-model ExecPlan + streaming chunked execution.

Reference: cpp/src/arrow/compute/exec/ — the ExecPlan/ExecNode skeleton
(exec_plan.h:39,84). The reference tree ships only the interfaces plus
test dummies (SURVEY.md era-critical facts); the production nodes here
(source/filter/project/aggregate/join/order_by/sink) are designed fresh
against those interfaces.
"""

from .plan import (Declaration, ExecNode, ExecPlan, aggregate_node,  # noqa: F401
                   filter_node, join_node, order_by_node, project_node,
                   sink_node, source_node)
from .streaming import (StreamingAggregator, StreamingGroupBy,  # noqa: F401
                        run_streaming_aggregate)
from .compiled import CompiledPipeline, PipelineBuilder  # noqa: F401
from .dist_compiled import (DistCompiledPipeline,  # noqa: F401
                            DistPipelineBuilder)
from .staged_groupby import staged_group_by  # noqa: F401
