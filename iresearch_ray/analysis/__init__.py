"""Analyzer registry (mirrors the reference's REGISTER_ANALYZER_* registry,
/root/reference/core/analysis/analyzers.cpp) — name + options -> analyzer."""

from iresearch_ray.analysis.tokenizers import (  # noqa: F401
    Analyzer,
    DelimiterAnalyzer,
    NgramAnalyzer,
    NormalizeAnalyzer,
    PipelineAnalyzer,
    RegexTokenizer,
    StopwordsAnalyzer,
    get_analyzer,
    register_analyzer,
)

from iresearch_ray.analysis import numeric as _numeric  # noqa: F401 — registers 'numeric'
from iresearch_ray.analysis import stem as _stem  # noqa: F401 — registers 'stem'/'text'
from iresearch_ray.analysis import tokens as _tokens  # noqa: F401 — registers keyword/boolean/null/collation
from iresearch_ray.analysis import minhash as _minhash  # noqa: F401 — registers 'minhash'
