"""Source-format coverage: WARC / JSONL / CSV readers must yield the
same pages (and the same dedup clusters) as the parquet path."""

import base64
import json
import os

import pandas as pd
import pytest
import ray.data as rd

from gencore_ray.config import DedupConfig
from gencore_ray.corpus import generate_pages
from gencore_ray.pipelines.dedup import dedup_pages
from gencore_ray.sources import (
    SchemaError,
    _parse_warc_bytes,
    read_pages_jsonl,
    read_pages_warc,
    validate_columns,
    write_warc,
)

CFG = DedupConfig()


def test_warc_roundtrip_and_pipeline_parity(ray_session, tmp_path):
    pages_tbl = generate_pages(120, seed=5)
    df = pages_tbl.to_pandas()
    recs = [
        {"url": r.url, "warc_ts": r.warc_ts, "html": r.html}
        for r in df.itertuples()
    ]
    # shard across two WARC files (one read task each)
    warc_dir = tmp_path / "warc"
    warc_dir.mkdir()
    write_warc(recs[:60], str(warc_dir / "a.warc"))
    write_warc(recs[60:], str(warc_dir / "b.warc"))

    pages = read_pages_warc(str(warc_dir))
    got = pages.to_pandas().sort_values("url").reset_index(drop=True)
    want = df[["url", "warc_ts", "html"]].sort_values("url").reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want)

    # full pipeline over the WARC source == over the in-memory table
    w = dedup_pages(read_pages_warc(str(warc_dir)), CFG,
                    extract_html=True).clusters.to_pandas()
    p = dedup_pages(
        rd.from_arrow(pages_tbl.select(["url", "warc_ts", "html"])), CFG,
        extract_html=True,
    ).clusters.to_pandas()
    mw = dict(zip(w["url"], w["cluster_id"]))
    mp = dict(zip(p["url"], p["cluster_id"]))
    assert mw == mp


def test_warc_parser_skips_malformed():
    good = (
        b"WARC/1.0\r\nWARC-Type: response\r\n"
        b"WARC-Target-URI: http://x/\r\nContent-Length: 27\r\n\r\n"
        b"HTTP/1.1 200 OK\r\n\r\n<p>a</p>\r\n\r\n"
    )
    junk = b"WARC/1.0\r\nWARC-Type: request\r\nContent-Length: 3\r\n\r\nabc\r\n\r\n"
    bad_len = b"WARC/1.0\r\nWARC-Type: response\r\nContent-Length: nope\r\n\r\n"
    recs = _parse_warc_bytes(junk + good + bad_len)
    assert len(recs) == 1
    assert recs[0]["url"] == "http://x/"
    assert recs[0]["html"] == b"<p>a</p>"


def test_jsonl_reader(ray_session, tmp_path):
    pages_tbl = generate_pages(40, seed=6)
    df = pages_tbl.to_pandas()
    path = tmp_path / "pages.jsonl"
    with open(path, "w") as f:
        for r in df.itertuples():
            f.write(json.dumps({
                "url": r.url,
                "warc_ts": r.warc_ts.isoformat(),
                "html": base64.b64encode(r.html).decode(),
                "text": r.text,
                "lang": r.lang,
            }) + "\n")
    got = read_pages_jsonl(str(path)).to_pandas().sort_values("url").reset_index(drop=True)
    want = df.sort_values("url").reset_index(drop=True)
    assert got["html"].tolist() == want["html"].tolist()
    assert got["text"].tolist() == want["text"].tolist()
    assert (got["warc_ts"] == want["warc_ts"]).all()


def test_jsonl_writer_roundtrip(ray_session, tmp_path):
    """write_pages_jsonl -> read_pages_jsonl is table-identical
    (binary via base64, timestamps via ISO microseconds)."""
    import ray.data as rd

    from gencore_ray.sources import write_pages_jsonl

    pages_tbl = generate_pages(50, seed=7)
    out = str(tmp_path / "shards")
    write_pages_jsonl(rd.from_arrow(pages_tbl), out)
    got = (read_pages_jsonl(out).to_pandas()
           .sort_values("url").reset_index(drop=True))
    want = pages_tbl.to_pandas().sort_values("url").reset_index(drop=True)
    assert got["html"].tolist() == want["html"].tolist()
    assert got["text"].tolist() == want["text"].tolist()
    assert got["lang"].tolist() == want["lang"].tolist()
    assert (got["warc_ts"] == want["warc_ts"]).all()


def test_csv_reader(ray_session, tmp_path):
    from gencore_ray.sources import read_pages_csv

    df = pd.DataFrame({
        "url": ["u1", "u2"],
        "text": ["hello world text", "another page body"],
        "lang": ["en", "en"],
    })
    path = tmp_path / "pages.csv"
    df.to_csv(path, index=False)
    got = read_pages_csv(str(path)).to_pandas().sort_values("url").reset_index(drop=True)
    pd.testing.assert_frame_equal(got, df)


def test_validate_columns_flags_offending_file(tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq

    d = tmp_path / "mixed"
    d.mkdir()
    pq.write_table(pa.table({"url": ["a"], "text": ["x"]}), str(d / "ok.parquet"))
    pq.write_table(pa.table({"url": ["b"]}), str(d / "bad.parquet"))
    with pytest.raises(SchemaError) as ei:
        validate_columns(str(d), {"url", "text"})
    assert "bad.parquet" in str(ei.value)
