"""enwiki-lines TSV source (the reference's benchmark corpus format).

The reference's ``index-put`` reads ``enwiki-YYYYMMDD-lines-1k.txt``: one
document per line, three tab-separated fields ``title \\t date \\t body``
(utils/index-put.cpp:281-307 wiki reader; the files come from
scripts/download-benchmark-resources.sh).  ``read_benchmark_lines`` maps
that into the (url, warc_ts, text) shape the rest of this repo uses, so a
reference user can point ``build_index`` / ``ingest`` at their existing
line files unchanged.

Scale shape: ``ray.data.read_csv`` parallelizes ACROSS files but reads
each file as one task (Ray's CSV datasource does not byte-range-split a
single file the way Parquet row groups do) — split a multi-GB corpus
into many line files before ingesting, as the published benchmark
chunks already are; the field mapping is a per-batch rename plus one
vectorized timestamp parse.
"""

from __future__ import annotations

import pyarrow as pa


def read_benchmark_lines(paths, date_format: str = "%d-%b-%Y %H:%M:%S",
                         on_malformed: str = "skip"):
    """Dataset(url, warc_ts, text) from reference benchmark line files.

    ``title`` becomes the document key (``url`` column), ``body`` is
    carried VERBATIM as ``text`` (the north rule's byte-identical
    invariant — no re-encoding, no stripping), and ``date`` parses with
    ``date_format`` (Lucene line-doc style ``01-Apr-2012 00:00:00.000``
    by default); unparseable dates become null rather than failing the
    read.

    ``on_malformed``: ``'skip'`` drops rows with the wrong field count
    (the reference reader's skip-and-continue behavior — note the loss
    is SILENT per row: compare the built index's num_docs against your
    expected corpus size, or use ``'error'`` to fail loudly on e.g. a
    systematic literal-tab-in-body problem).
    """
    import pyarrow.compute as pc
    import ray.data
    from pyarrow import csv as pacsv

    if on_malformed not in ("skip", "error"):
        raise ValueError("on_malformed must be 'skip' or 'error'")

    def to_pages(b: pa.Table) -> pa.Table:
        # Arrow strptime has no %f: drop the line-doc ".000" millis
        # suffix before parsing (sub-second precision is zero in the
        # published benchmark files anyway)
        date = pc.replace_substring_regex(b["date"], r"\.\d+$", "")
        ts = pc.strptime(date, format=date_format, unit="us",
                         error_is_null=True)
        return pa.table({"url": b["title"], "warc_ts": ts,
                         "text": b["body"]})

    return ray.data.read_csv(
        paths,
        read_options=pacsv.ReadOptions(
            column_names=["title", "date", "body"]),
        parse_options=pacsv.ParseOptions(
            delimiter="\t", quote_char=False,
            invalid_row_handler=(
                (lambda row: "skip") if on_malformed == "skip" else None)),
        convert_options=pacsv.ConvertOptions(column_types={
            "title": pa.string(), "date": pa.string(),
            "body": pa.string()}),
    ).map_batches(to_pages, batch_format="pyarrow")
