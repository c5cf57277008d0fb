from .extract import (
    extract_time, extract_nrepair, extract_fact_time, map_back_to_baseline,
    collect_results, summarize,
)
