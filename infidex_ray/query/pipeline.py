"""Coverage + fusion orchestration (Stage 2/3).

Port of SearchPipeline.ExecuteCoverageStage (reference:
src/Infidex/Scoring/SearchPipeline.cs:298-522). Filled in by M4; until the
coverage engine lands, ``coverage_stage`` returns None so the engine falls
back to the stage-1 BM25 backbone.
"""

from __future__ import annotations


def coverage_stage(engine, norm_query, stage1_results, coverage_depth, top_k):
    return None
