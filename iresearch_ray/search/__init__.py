"""Query engine: filters, scorers, top-k execution over index segments."""

from iresearch_ray.search.filters import (  # noqa: F401
    AllFilter,
    AndFilter,
    ColumnExistenceFilter,
    EmptyFilter,
    FuzzyFilter,
    GranularRangeFilter,
    NestedFilter,
    NgramSimilarityFilter,
    NotFilter,
    OrFilter,
    PhraseFilter,
    PrefixFilter,
    ProxyFilter,
    RangeFilter,
    SamePositionFilter,
    TermFilter,
    TermsFilter,
    WildcardFilter,
)
from iresearch_ray.search.scorers import BM25, TFIDF, BoostScore, get_scorer  # noqa: F401
from iresearch_ray.search.executor import IndexReader, IndexSearcher  # noqa: F401
