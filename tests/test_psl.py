"""Public-suffix-list registrable-domain mode (round 5): unit cases for
every rule class, a differential fuzz against the SQL CTE twin, and
registrable-mode runs of the per-domain operators."""

import numpy as np
import pandas as pd
import pytest
import ray.data

from iresearch_ray.pipelines import curate


def test_registrable_domain_cases():
    psl = curate.load_psl()
    cases = {
        # 2nd-level public suffix: a.co.uk / b.co.uk are DISTINCT
        # registrable domains, their subdomains collapse into them
        "a.co.uk": "a.co.uk",
        "deep.sub.a.co.uk": "a.co.uk",
        "b.co.uk": "b.co.uk",
        "co.uk": "",          # IS a public suffix
        "uk": "",
        "example.com": "example.com",
        "sub.example.com": "example.com",
        # private-domain rules
        "example.github.io": "example.github.io",
        "deep.example.github.io": "example.github.io",
        "github.io": "",
        "b.s3.amazonaws.com": "b.s3.amazonaws.com",
        "s3.amazonaws.com": "",
        # wildcard *.ck: any label under ck is a public suffix
        "x.ck": "",
        "a.x.ck": "a.x.ck",
        "ck": "",
        # exception !www.ck beats the wildcard
        "www.ck": "www.ck",
        "a.www.ck": "www.ck",
        # unknown TLD -> default '*' rule (depth 1)
        "unknowntld": "",
        "foo.unknowntld": "foo.unknowntld",
        "a.b.unknowntld": "b.unknowntld",
        "": "",
        "1.2.3.4": "3.4",     # IPs are garbage-in, documented
    }
    hosts = np.array(list(cases), dtype=object)
    got = curate.registrable_domains(hosts, psl)
    for h, g in zip(hosts, got):
        assert g == cases[h], (h, g, cases[h])


def test_registrable_differential_fuzz(ray_session):
    """Random host soup through the engine resolver and the SQL CTE
    twin (same vendored rules, inlined as VALUES) must agree exactly —
    including empty labels, bare suffixes, wildcard/exception depths
    and over-deep hosts."""
    import duckdb

    import __ray_entry__ as entrymod

    rng = np.random.default_rng(43)
    labels = ["a", "b", "site7", "www", "x1", "co", "uk", "ck", "com",
              "github", "io", "org", "unknowntld", "", "s3", "amazonaws"]
    hosts = [".".join(rng.choice(labels, rng.integers(1, 6)))
             for _ in range(400)] + ["", "co.uk", "www.ck", "x.ck"]
    pdf = pd.DataFrame({"rid": range(len(hosts)), "host": hosts})
    psl = curate.load_psl()
    got = curate.registrable_domains(
        np.array(hosts, dtype=object), psl)
    con = duckdb.connect()
    con.register("hh", pdf)
    want = con.execute(f"""
        WITH {entrymod._psl_ctes_sql()}
        SELECT rid, rdomain FROM reg ORDER BY rid""").df()
    assert want["rdomain"].tolist() == list(got)


def test_registrable_mode_operators(ray_session):
    """domain_stats / cap_per_domain / domain_links keyed on
    registrable domains: co.uk sites stay distinct, subdomains of one
    registrable domain pool together."""
    rows = []
    for i in range(12):
        rows.append({"doc_id": f"d{i:02d}",
                     "url": f"http://sub{i % 3}.alpha.co.uk/p{i}",
                     "text": "tok tok tok",
                     "html": '<a href="http://x.beta.co.uk/q">y</a>'})
    for i in range(12, 18):
        rows.append({"doc_id": f"d{i:02d}",
                     "url": f"http://beta.co.uk/p{i}",
                     "text": "tok tok",
                     "html": '<a href="http://alpha.co.uk/q">y</a>'})
    ds = ray.data.from_items(rows)

    st = (curate.domain_stats(ds, domain_mode="registrable")
          .to_pandas().sort_values("domain").reset_index(drop=True))
    # host mode would yield 4 domains (3 subX.alpha + beta); registrable
    # pools the alpha subdomains
    assert st["domain"].tolist() == ["alpha.co.uk", "beta.co.uk"]
    assert st["n_docs"].tolist() == [12, 6]
    assert st["total_tokens"].tolist() == [36, 12]

    capped = curate.cap_per_domain(
        ds, cap=5, domain_mode="registrable").to_pandas()
    # 5 survivors per REGISTRABLE domain (the 5 smallest doc_ids each)
    assert sorted(capped["doc_id"]) == [
        "d00", "d01", "d02", "d03", "d04",
        "d12", "d13", "d14", "d15", "d16"]

    links = (curate.domain_links(ds, domain_mode="registrable")
             .to_pandas().sort_values(["src_domain", "dst_domain"])
             .reset_index(drop=True))
    assert links.values.tolist() == [
        ["alpha.co.uk", "beta.co.uk", 12],
        ["beta.co.uk", "alpha.co.uk", 6]]

    with pytest.raises(ValueError):
        curate.extract_domain(ds, mode="nope")


def test_psl_empty_rule_group_sql_twin(monkeypatch):
    """A PSL with NO wildcard/exception rules must compile to an EMPTY
    relation in the SQL twin, not a VALUES ('') placeholder: '' is a
    reachable k-label suffix (hosts with empty labels like '.a'), so
    the placeholder row would join where the Python resolver matches
    nothing (review finding, round 5)."""
    import duckdb

    import __ray_entry__ as entrymod

    fake = {"exact": pd.Index(["com"], dtype=object),
            "wild": pd.Index([], dtype=object),
            "exc": pd.Index([], dtype=object),
            "depth": 1}
    monkeypatch.setattr(curate, "load_psl",
                        lambda psl_path=None: fake)
    hosts = [".a", "a..b", "x.com", "com", "", "y.x.com", ".", "..",
             "a.", "b.com."]
    got = list(curate.registrable_domains(
        np.array(hosts, dtype=object), fake))
    pdf = pd.DataFrame({"rid": range(len(hosts)), "host": hosts})
    con = duckdb.connect()
    con.register("hh", pdf)
    want = con.execute(f"""
        WITH {entrymod._psl_ctes_sql()}
        SELECT rid, rdomain FROM reg ORDER BY rid""").df()
    assert want["rdomain"].tolist() == got
    # the specific divergence the placeholder caused: '.a' resolves via
    # the default depth-1 rule to registrable '.a', never via a
    # phantom ''-wildcard to depth 2
    assert got[hosts.index(".a")] == ".a"


def test_psl_random_rulefile_differential_fuzz(monkeypatch, tmp_path):
    """Random RULE FILES (not just random hosts): the placeholder bug
    this round was a rule-file-shape issue (no wildcard rules), so fuzz
    the generator over random exact/wildcard/exception mixes — sparse
    groups included — against the SQL twin on an adversarial host soup."""
    import duckdb

    import __ray_entry__ as entrymod

    labels = ["com", "uk", "co", "a", "b", "x1", "io", "gov"]
    rng = np.random.default_rng(7)
    for trial in range(6):
        n_exact = int(rng.integers(1, 5))
        n_wild = int(rng.integers(0, 3))   # 0 exercises the empty group
        n_exc = int(rng.integers(0, 2))
        mk = lambda k: ".".join(rng.choice(labels, int(k)))
        exact = {mk(rng.integers(1, 3)) for _ in range(n_exact)}
        wild = {mk(rng.integers(1, 2)) for _ in range(n_wild)}
        # an exception only means something under a wildcard base
        exc = {f"{rng.choice(labels)}.{w}"
               for w in list(wild)[:n_exc]} if wild else set()
        p = tmp_path / f"psl{trial}.dat"
        p.write_text("// fuzz\n" + "\n".join(
            sorted(exact) + [f"*.{w}" for w in sorted(wild)]
            + [f"!{e}" for e in sorted(exc)]) + "\n")
        psl = curate.load_psl(str(p))
        monkeypatch.setattr(curate, "load_psl",
                            lambda psl_path=None, _p=psl: _p)
        hosts = [".".join(rng.choice(labels + [""], int(rng.integers(1, 5))))
                 for _ in range(300)] + ["", ".", "..", ".com", "com."]
        got = list(curate.registrable_domains(
            np.array(hosts, dtype=object), psl))
        pdf = pd.DataFrame({"rid": range(len(hosts)), "host": hosts})
        con = duckdb.connect()
        con.register("hh", pdf)
        want = con.execute(f"""
            WITH {entrymod._psl_ctes_sql()}
            SELECT rid, rdomain FROM reg ORDER BY rid""").df()
        assert want["rdomain"].tolist() == got, (
            trial, sorted(exact), sorted(wild), sorted(exc))
        monkeypatch.undo()
