"""ray-job entry point: build -> consolidate -> query, resumable
(the north rule's `ray job submit` launch surface)."""

import json

import pytest

from iresearch_ray.job import main
from iresearch_ray.sources.pages import write_pages


@pytest.fixture(scope="module")
def pages(tmp_path_factory):
    base = tmp_path_factory.mktemp("job")
    p = str(base / "pages.parquet")
    write_pages(p, 300, row_group_size=100)
    return base, p


def test_job_build_query_resume(ray_session, pages, capsys):
    base, p = pages
    idx = str(base / "idx")
    assert main(["build", "--input", p, "--index-dir", idx,
                 "--target-docs", "100", "--analyzer", "ascii",
                 "--consolidate-target", "300"]) == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["num_docs"] == 300
    assert out["build_stats"]["segments_built"] == 3
    assert out["consolidated_segments"] == 1

    # resubmit: resume skips everything (lineage)
    assert main(["build", "--input", p, "--index-dir", idx,
                 "--target-docs", "100", "--analyzer", "ascii"]) == 0
    out2 = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out2["build_stats"]["segments_skipped"] == 3

    assert main(["query", "--index-dir", idx, "--term", "hterm",
                 "--k", "5", "--wand"]) == 0
    q = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert len(q["hits"]) == 5
    assert all(h["score"] >= q["hits"][-1]["score"] for h in q["hits"])


def test_job_query_uses_recorded_analyzer_options(ray_session, tmp_path, capsys):
    """Query words go through the index's FULL recorded analyzer config:
    name alone would drop options (here lowercase=False) and silently
    analyze the query differently from the indexed terms."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    p = str(tmp_path / "docs.parquet")
    pq.write_table(pa.table({
        "url": ["u1", "u2", "u3"],
        "text": ["Alpha common words", "alpha common words", "other text"],
    }), p)
    idx = str(tmp_path / "idx")
    assert main(["build", "--input", p, "--index-dir", idx,
                 "--analyzer", "unicode",
                 "--analyzer-opts", '{"lowercase": false}',
                 "--target-docs", "10"]) == 0
    capsys.readouterr()
    assert main(["query", "--index-dir", idx, "--query", "Alpha"]) == 0
    q = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    # case-sensitive index: "Alpha" must hit u1 only (a name-only analyzer
    # rebuild would lowercase the query word and hit u2 instead)
    assert [h["key"] for h in q["hits"]] == ["u1"]


def test_job_build_from_lines_format(ray_session, tmp_path, capsys):
    """--input-format lines stages the reference enwiki-lines TSV to
    Parquet once and builds a queryable index from it; a resubmit reuses
    both the staging and the segments."""
    lines = tmp_path / "corpus.txt"
    rows = [f"Doc {i}\t01-Apr-2012 00:00:00.000\tshared needle body {i}"
            for i in range(30)]
    lines.write_text("\n".join(rows) + "\n", encoding="utf-8")
    idx = str(tmp_path / "idx")
    args = ["build", "--input", str(lines), "--input-format", "lines",
            "--index-dir", idx, "--target-docs", "20",
            "--analyzer", "ascii"]
    assert main(args) == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["num_docs"] == 30

    assert main(args) == 0  # resubmit: staged parquet + segments reused
    out2 = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out2["build_stats"]["segments_skipped"] == out2["segments"]

    assert main(["query", "--index-dir", idx, "--term", "needle",
                 "--k", "5"]) == 0
    q = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert len(q["hits"]) == 5


def test_job_dedup_and_stats_subcommands(ray_session, tmp_path, capsys):
    """dedup/stats subcommands stage results atomically and resume
    (re-submitting the same job is a no-op reporting prior output)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    rows = [{"doc_id": 0, "text": "alpha beta gamma delta epsilon zeta"},
            {"doc_id": 1, "text": "alpha beta gamma delta epsilon zeta"},
            {"doc_id": 2, "text": "totally different words entirely here"}]
    src = str(tmp_path / "docs.parquet")
    pq.write_table(pa.Table.from_pylist(rows), src)

    out_dir = str(tmp_path / "dedup_out")
    assert main(["dedup", "--input", src, "--output", out_dir,
                 "--method", "exact"]) == 0
    rep = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rep["rows"] == 2 and rep["resumed"] is False
    got = pq.read_table(out_dir).to_pandas().sort_values("text_hash")
    assert got["dup_count"].sum() == 3

    # resubmit: resumed, identical rows
    assert main(["dedup", "--input", src, "--output", out_dir,
                 "--method", "exact"]) == 0
    rep2 = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rep2["resumed"] is True and rep2["rows"] == 2

    span_dir = str(tmp_path / "spans_out")
    assert main(["dedup", "--input", src, "--output", span_dir,
                 "--method", "span-stats", "--k", "5"]) == 0
    rep3 = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rep3["rows"] == 3
    stats = pq.read_table(span_dir).to_pandas().set_index("doc_id")
    assert stats.loc[0, "dup_frac"] == 1.0 and stats.loc[2, "dup_frac"] == 0.0

    st_dir = str(tmp_path / "stats_out")
    assert main(["stats", "--input", src, "--output", st_dir,
                 "--op", "bigrams", "--k-top", "3"]) == 0
    rep4 = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rep4["rows"] == 3
    bg = pq.read_table(st_dir).to_pandas()
    assert bg.iloc[0]["bigram"] == "alpha beta" and bg.iloc[0]["n"] == 2

    corpus_dir = str(tmp_path / "corpus_out")
    assert main(["dedup", "--input", src, "--output", corpus_dir,
                 "--method", "corpus", "--threshold", "0.9"]) == 0
    rep5 = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rep5["rows"] == 2  # one exact-dup family collapses to doc 0
    surv = pq.read_table(corpus_dir).to_pandas()
    assert sorted(surv["doc_id"]) == [0, 2]

    red_dir = str(tmp_path / "redact_out")
    assert main(["stats", "--input", src, "--output", red_dir,
                 "--op", "redact-pii"]) == 0
    rep6 = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rep6["rows"] == 3
    red = pq.read_table(red_dir).to_pandas()
    assert (red["n_email"] == 0).all()  # corpus has no PII
    assert set(red.columns) >= {"doc_id", "text_redacted"}


def test_job_domain_subcommands(ray_session, tmp_path, capsys):
    import pyarrow as pa
    import pyarrow.parquet as pq

    rows = [{"doc_id": i, "url": f"http://hot.io/p{i}",
             "text": "alpha beta gamma"} for i in range(5)]
    rows.append({"doc_id": 5, "url": "https://www.Cold.org:443/x",
                 "text": "delta epsilon"})
    src = str(tmp_path / "docs.parquet")
    pq.write_table(pa.Table.from_pylist(rows), src)

    st_dir = str(tmp_path / "domains_out")
    assert main(["stats", "--input", src, "--output", st_dir,
                 "--op", "domains"]) == 0
    rep = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rep["rows"] == 2
    st = pq.read_table(st_dir).to_pandas().set_index("domain")
    assert int(st.loc["hot.io", "n_docs"]) == 5
    assert int(st.loc["hot.io", "total_tokens"]) == 15
    assert int(st.loc["cold.org", "n_docs"]) == 1

    cap_dir = str(tmp_path / "cap_out")
    assert main(["dedup", "--input", src, "--output", cap_dir,
                 "--method", "cap-domain", "--cap", "2"]) == 0
    rep2 = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rep2["rows"] == 3
    surv = pq.read_table(cap_dir).to_pandas()
    assert sorted(surv["doc_id"]) == [0, 1, 5]

    # --domain-mode registrable keys on PSL registrable domains (round
    # 5): sub.a.co.uk / a.co.uk pool, b.co.uk stays separate — and the
    # mode is a staging param, so it restages rather than resumes
    rows3 = ([{"doc_id": i, "url": f"http://sub{i}.a.co.uk/p",
               "text": "one two"} for i in range(3)]
             + [{"doc_id": 3, "url": "http://b.co.uk/q",
                 "text": "three"}])
    src3 = str(tmp_path / "psl_docs.parquet")
    pq.write_table(pa.Table.from_pylist(rows3), src3)
    psl_dir = str(tmp_path / "psl_out")
    assert main(["stats", "--input", src3, "--output", psl_dir,
                 "--op", "domains", "--domain-mode", "registrable"]) == 0
    rep3 = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rep3["rows"] == 2
    st3 = pq.read_table(psl_dir).to_pandas().set_index("domain")
    assert int(st3.loc["a.co.uk", "n_docs"]) == 3
    assert int(st3.loc["b.co.uk", "n_docs"]) == 1


def test_job_webgraph_subcommands(ray_session, tmp_path, capsys):
    import pyarrow as pa
    import pyarrow.parquet as pq

    rows = [{"doc_id": 0, "url": "http://a.com/p",
             "html": '<a href="http://b.org/x">l</a>'
                     '<a href="http://b.org/y">m</a><p>hi &amp; bye</p>'},
            {"doc_id": 1, "url": "http://b.org/q",
             "html": '<a href="http://a.com/z">n</a>'}]
    src = str(tmp_path / "pages.parquet")
    pq.write_table(pa.Table.from_pylist(rows), src)

    ln_dir = str(tmp_path / "links_out")
    assert main(["stats", "--input", src, "--output", ln_dir,
                 "--op", "links"]) == 0
    rep = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rep["rows"] == 2
    ed = pq.read_table(ln_dir).to_pandas()
    edges = {(r.src_domain, r.dst_domain): r.n for r in ed.itertuples()}
    assert edges == {("a.com", "b.org"): 2, ("b.org", "a.com"): 1}

    pr_dir = str(tmp_path / "rank_out")
    assert main(["stats", "--input", src, "--output", pr_dir,
                 "--op", "domain-rank"]) == 0
    rep2 = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rep2["rows"] == 2
    pr = pq.read_table(pr_dir).to_pandas().set_index("node")
    assert abs(pr["rank"].sum() - 1.0) < 1e-6  # mass conserved

    tx_dir = str(tmp_path / "text_out")
    assert main(["stats", "--input", src, "--output", tx_dir,
                 "--op", "extract-text"]) == 0
    rep3 = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rep3["rows"] == 2
    tx = pq.read_table(tx_dir).to_pandas().set_index("doc_id")
    assert tx.loc[0, "text_extracted"] == "l m hi & bye"
    assert list(tx.columns) == ["text_extracted"]
