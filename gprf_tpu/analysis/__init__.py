from gprf_tpu.analysis.results import (
    RESULT_COLS,
    analyze_run,
    load_results,
    load_final_results,
    read_result_line,
)

__all__ = [
    "RESULT_COLS",
    "analyze_run",
    "load_results",
    "load_final_results",
    "read_result_line",
]
