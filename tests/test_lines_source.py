"""enwiki-lines TSV source: field mapping, byte-verbatim text, malformed
rows, and an end-to-end index over a line file (reference
utils/index-put.cpp:281-307 wiki reader parity)."""

import pytest

from iresearch_ray.sources.lines import read_benchmark_lines


@pytest.fixture()
def line_file(tmp_path):
    body1 = "the quick brown fox jumps over the lazy dog"
    body2 = "shared term quick here with  double spaces and café"
    rows = [
        f"Article One\t01-Apr-2012 00:00:00.000\t{body1}",
        f"Article Two\t15-Nov-2013 12:30:45.123\t{body2}",
        "BadRow\tonly-two-fields",                      # skipped
        "Article Three\tnot a date\tthird body text",   # null ts, kept
    ]
    p = tmp_path / "enwiki-lines.txt"
    p.write_text("\n".join(rows) + "\n", encoding="utf-8")
    return str(p), body1, body2


def test_lines_reader_maps_and_keeps_text_verbatim(ray_session, line_file):
    path, body1, body2 = line_file
    df = read_benchmark_lines(path).to_pandas()
    assert list(df.columns) == ["url", "warc_ts", "text"]
    assert len(df) == 3  # malformed row skipped
    by_url = df.set_index("url")
    # byte-identical body carry-through (north-rule invariant)
    assert by_url.loc["Article One", "text"] == body1
    assert by_url.loc["Article Two", "text"] == body2
    ts = by_url.loc["Article One", "warc_ts"]
    assert ts.year == 2012 and ts.month == 4
    assert by_url.loc["Article Three", "warc_ts"] is None or \
        str(by_url.loc["Article Three", "warc_ts"]) == "NaT"


def test_lines_reader_end_to_end_index(ray_session, line_file, tmp_path):
    from iresearch_ray.index.build import build_index
    from iresearch_ray.search import IndexReader, IndexSearcher
    from iresearch_ray.search.filters import TermFilter

    path, _, _ = line_file
    staged = str(tmp_path / "staged")
    read_benchmark_lines(path).write_parquet(staged)
    idx = str(tmp_path / "idx")
    build_index(staged, idx, analyzer="ascii", key_column="url",
                target_docs=10)
    searcher = IndexSearcher(IndexReader(idx))
    hits = searcher.search(TermFilter("quick"), k=10)
    assert set(hits["key"]) == {"Article One", "Article Two"}


def test_lines_reader_strict_mode_raises(ray_session, line_file):
    """on_malformed='error' fails loudly on a wrong-field-count row
    instead of silently shrinking the corpus; bogus values are rejected."""
    path, _, _ = line_file
    with pytest.raises(Exception):
        read_benchmark_lines(path, on_malformed="error").to_pandas()
    with pytest.raises(ValueError, match="on_malformed"):
        read_benchmark_lines(path, on_malformed="bogus")
