"""Query engine: filters, scorers, top-k execution over index segments."""

from iresearch_ray.search.filters import (  # noqa: F401
    AllFilter,
    AndFilter,
    FuzzyFilter,
    NotFilter,
    OrFilter,
    PhraseFilter,
    PrefixFilter,
    RangeFilter,
    TermFilter,
    TermsFilter,
    WildcardFilter,
)
from iresearch_ray.search.scorers import BM25, TFIDF, BoostScore, get_scorer  # noqa: F401
from iresearch_ray.search.executor import IndexReader, IndexSearcher  # noqa: F401
