"""Materialize the reference oracle's outputs for the entry's fixed crawl
(default_specs(seed=123), single cycle) into ``oracle_dumps/*.parquet`` so
the driver's DuckDB side can independently check the four crawl queries
(VERDICT r02 "What's missing" #4 — converts the rows-only ``no_oracle``
checks into full rows+schema+hash checks).

Pure Python + pyarrow — no Spark. The dump is the *reference algorithm's*
answer (LifoQueue replay in oracle/reference_oracle.py), not the engine's:
the engine must reproduce it through a completely different execution
strategy, which is exactly what makes the comparison a real oracle. The
media dumps reuse the same pure per-payload codec functions the
Spark mapInPandas stages wrap (operators/multimodal.py) — independent in
everything that can break at scale (explode/distinct/batching/rounding),
shared only in the deterministic fake codec itself.

Run: python scripts/dump_crawl_oracle.py   (idempotent; commit the output)
"""

from __future__ import annotations

import hashlib
import os
import sys

import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from lyrics_crawler_spark.operators.multimodal import (  # noqa: E402
    decode_bmp, decode_features, decode_wav, encode_bmp, frame_slices,
    resize_px, synth_payload,
)
from lyrics_crawler_spark.oracle import ReferenceOracle  # noqa: E402
from lyrics_crawler_spark.sitegen.graph import default_specs  # noqa: E402

OUT_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "oracle_dumps"
)


def main() -> None:
    os.makedirs(OUT_DIR, exist_ok=True)
    specs = default_specs(seed=123)
    results = {s.start_url: ReferenceOracle(s).run() for s in specs}

    # ---- crawl_trace: per-site visit order, seq = 1-based pop index ----
    trace = {"site": [], "url": [], "task_type": [], "action": [],
             "n_errors": [], "seq": []}
    for site, res in results.items():
        for i, t in enumerate(res.trace):
            trace["site"].append(site)
            trace["url"].append(t["url"])
            trace["task_type"].append(t["task_type"])
            trace["action"].append(t["action"])
            trace["n_errors"].append(t["n_errors"])
            trace["seq"].append(i + 1)
    _write("crawl_trace", trace, {"task_type": pa.int32(), "n_errors": pa.int32(),
                                  "seq": pa.int32()})

    # ---- crawl_seen_set: saved (start_url, song_url) + doc_id ----
    # doc_id = the song occurrence's abs_url; song composition is plain
    # concat for every topology (the '/' quirk is topo1 artist pages only
    # — functions/urls.py:compose_url).
    seen = {"start_url": [], "song_url": [], "doc_id": []}
    for site, res in results.items():
        for (su, url) in sorted(res.seen):
            seen["start_url"].append(su)
            seen["song_url"].append(url)
            seen["doc_id"].append(su + url)
    _write("crawl_seen_set", seen, {})

    # ---- crawl_documents_spans: exploded span sequences ----
    # nullable text/media_ref are coalesced to '' on BOTH sides so the
    # driver's value normalization can never diverge on None vs NaN.
    spans = {"start_url": [], "song_url": [], "pos": [], "kind": [],
             "text": [], "media_ref": [], "offset": []}
    media_refs: set[str] = set()
    for site, res in results.items():
        for (su, url), doc in res.docs.items():
            for i, s in enumerate(doc["spans"]):
                spans["start_url"].append(su)
                spans["song_url"].append(url)
                spans["pos"].append(i)
                spans["kind"].append(s["kind"])
                spans["text"].append(s["text"] if s["text"] is not None else "")
                spans["media_ref"].append(
                    s["media_ref"] if s["media_ref"] is not None else ""
                )
                spans["offset"].append(s["offset"])
                if s["kind"] == "media" and s["media_ref"]:
                    media_refs.add(s["media_ref"])
    _write("crawl_documents_spans", spans, {"pos": pa.int32(), "offset": pa.int32()})

    # ---- crawl_media_features: distinct refs -> synthesized REAL
    # BMP/WAV payloads -> real decode -> integer-ppm buckets (the same
    # pure per-payload functions the Spark mapInPandas stages wrap;
    # plumbing independent, codec shared) ----
    feats = {"media_ref": [], "kind": [], "bucket": [], "value_ppm": []}
    import numpy as np

    for ref in sorted(media_refs):
        kind = "image" if ref.endswith(".png") else "audio"
        payload, _w, _h, _d = synth_payload(ref, kind)
        for b, v in enumerate(decode_features(payload, kind)):
            # mirror the Spark query: feature lands as float32, then
            # F.round(v * 1e6) (HALF_UP on the double upcast).
            v32 = float(np.float32(v))
            feats["media_ref"].append(ref)
            feats["kind"].append(kind)
            feats["bucket"].append(b)
            feats["value_ppm"].append(int(np.floor(v32 * 1e6 + 0.5)))
    _write("crawl_media_features", feats,
           {"bucket": pa.int32(), "value_ppm": pa.int64()})

    # ---- crawl_media_decoded: the T13 decode proof. Metadata parsed
    # back out of the container bytes; md5 over the re-encoded
    # nearest-neighbor resize (images, target 24) / the first real PCM
    # frame slice (audio, 400 ms grid, max 6); decoded-duration frame
    # count. Mirrors __spark_entry__.crawl_media_decoded exactly. ----
    dec = {"media_ref": [], "kind": [], "width": [], "height": [],
           "duration_ms": [], "content_md5": [], "n_frames": []}
    for ref in sorted(media_refs):
        kind = "image" if ref.endswith(".png") else "audio"
        payload, _w, _h, _d = synth_payload(ref, kind)
        if kind == "image":
            px = decode_bmp(payload)
            w, h, dur = int(px.shape[1]), int(px.shape[0]), -1
            md5 = hashlib.md5(encode_bmp(resize_px(px, 24))).hexdigest()
            n_frames = 0
        else:
            rate, samples = decode_wav(payload)
            w, h = -1, -1
            dur = len(samples) * 1000 // rate
            slices = frame_slices(payload, every_ms=400, max_frames=6)
            md5 = hashlib.md5(slices[0][2]).hexdigest()
            n_frames = len(slices)
        dec["media_ref"].append(ref)
        dec["kind"].append(kind)
        dec["width"].append(w)
        dec["height"].append(h)
        dec["duration_ms"].append(dur)
        dec["content_md5"].append(md5)
        dec["n_frames"].append(n_frames)
    _write("crawl_media_decoded", dec,
           {"width": pa.int32(), "height": pa.int32(),
            "duration_ms": pa.int32(), "n_frames": pa.int64()})


def _write(name: str, cols: dict, types: dict) -> None:
    arrays, fields = [], []
    for col, vals in cols.items():
        t = types.get(col, pa.string() if vals and isinstance(vals[0], str)
                      else pa.int64())
        arrays.append(pa.array(vals, type=t))
        fields.append(pa.field(col, t))
    table = pa.Table.from_arrays(arrays, schema=pa.schema(fields))
    path = os.path.join(OUT_DIR, f"{name}.parquet")
    pq.write_table(table, path)
    print(f"{name}: {table.num_rows} rows -> {path}")


if __name__ == "__main__":
    main()
