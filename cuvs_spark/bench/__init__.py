from cuvs_spark.bench.sweep import (  # noqa: F401
    BACKENDS,
    expand_grid,
    export_results,
    pareto_frontier,
    run_sweep,
)
