"""Round-3 hardening tests: ADVICE fixes (merge-policy in the run-spec
fold guard, z-order shift-overflow guard, empty-input quantiles,
interval_join right_cols projection of both bounds)."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd

import aws_serverless_elt_pipeline_enterprise_ray as engine


# ---------------------------------------------------------------------------
# _same_run_spec must include merge_policy (ADVICE: a prebuilt LWW
# stream must not be applied under a coalesce-policy fold)
# ---------------------------------------------------------------------------


def test_same_run_spec_distinguishes_merge_policy():
    import dataclasses

    from aws_serverless_elt_pipeline_enterprise_ray.pipelines.cdc import _same_run_spec

    spec = engine.default_spec(num_partitions=4)
    other = dataclasses.replace(spec, merge_policy="coalesce")
    assert _same_run_spec(spec, spec)
    assert not _same_run_spec(spec, other)


# ---------------------------------------------------------------------------
# z-order shift overflow: >4 cols at bits=16 must not shift >= 64
# ---------------------------------------------------------------------------


def test_zorder_many_columns_stays_in_64_bits():
    from aws_serverless_elt_pipeline_enterprise_ray.pipelines.compact import (
        _zorder_argsort,
    )

    rng = np.random.default_rng(7)
    n = 256
    cols = {f"c{i}": rng.integers(0, 1000, n) for i in range(5)}
    t = pa.table(cols)
    idx = _zorder_argsort(t, tuple(cols), bits=16)
    assert sorted(idx.tolist()) == list(range(n))
    # clustering still works: the leading column must be far from
    # random order (adjacent-pair locality better than shuffled)
    v = t["c0"].to_numpy()[idx]
    locality = np.abs(np.diff(v.astype(np.int64))).mean()
    shuffled = np.abs(np.diff(np.sort(v)[rng.permutation(n)].astype(np.int64))).mean()
    assert locality < shuffled * 0.8


# ---------------------------------------------------------------------------
# quantile_thresholds on an empty dataset
# ---------------------------------------------------------------------------


def test_quantile_thresholds_empty_input():
    from aws_serverless_elt_pipeline_enterprise_ray.functions.aggregates import (
        filter_by_quantile,
        quantile_thresholds,
    )

    ds = rd.from_arrow(pa.table({"v": pa.array([], type=pa.int64())}))
    th = quantile_thresholds(ds, col="v", quantiles=(0.1, 0.9))
    assert th == {0.1: 0, 0.9: 0}
    out = filter_by_quantile(ds, col="v", q_lo=0.1, q_hi=0.9)
    assert out.count() == 0


# ---------------------------------------------------------------------------
# interval_join with right_cols that excludes the bound columns
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("disjoint", [False, True])
def test_interval_join_right_cols_without_bounds(disjoint):
    from aws_serverless_elt_pipeline_enterprise_ray.functions.joins import (
        interval_join,
    )

    pts = rd.from_pandas(
        pd.DataFrame(
            {"k": ["a", "a", "b"], "t": [5, 50, 7], "x": [1, 2, 3]}
        )
    )
    ivs = rd.from_pandas(
        pd.DataFrame(
            {
                "k": ["a", "b"],
                "lo": [0, 0],
                "hi": [10, 10],
                "label": ["first", "second"],
            }
        )
    )
    out = (
        interval_join(
            pts,
            ivs,
            by="k",
            on="t",
            start="lo",
            end="hi",
            how="inner",
            right_cols=["label"],
            disjoint=disjoint,
        )
        .to_pandas()
        .sort_values(["k", "t"])
        .reset_index(drop=True)
    )
    assert list(out.columns) == ["k", "t", "x", "label"]
    assert out["label"].tolist() == ["first", "second"]
    assert out["t"].tolist() == [5, 7]


# ---------------------------------------------------------------------------
# hot-key-safe overlapping interval join (VERDICT #4)
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("how", ["inner", "left"])
def test_interval_join_hot_key_path_matches_plain(how):
    """A planted hot key (many overlapping intervals) must take the
    broadcast tile path and produce EXACTLY the plain bucketed result -
    the per-key cross product never lands in one bucket worker."""
    import numpy as np

    from aws_serverless_elt_pipeline_enterprise_ray.functions.joins import (
        _interval_hot_keys,
        interval_join,
    )

    rng = np.random.default_rng(11)
    # hot key: 300 overlapping intervals; cold keys: 3 each
    ivs = []
    for i in range(300):
        lo = int(rng.integers(0, 900))
        ivs.append(("hot", lo, lo + int(rng.integers(5, 120)), f"h{i}"))
    for k in ("c1", "c2"):
        for i in range(3):
            lo = int(rng.integers(0, 900))
            ivs.append((k, lo, lo + 50, f"{k}-{i}"))
    ivs_df = pd.DataFrame(ivs, columns=["k", "lo", "hi", "label"])
    pts_df = pd.DataFrame(
        {
            "k": ["hot"] * 400 + ["c1"] * 30 + ["c2"] * 30 + ["lonely"] * 5,
            "t": rng.integers(0, 1100, 465),
            "x": np.arange(465),
        }
    )

    def run(threshold):
        out = interval_join(
            rd.from_pandas(pts_df),
            rd.from_pandas(ivs_df),
            by="k", on="t", start="lo", end="hi", how=how,
            hot_key_intervals=threshold,
        ).to_pandas()
        return (
            out.sort_values(["k", "t", "x", "label"], na_position="last")
            .reset_index(drop=True)
        )

    hot = _interval_hot_keys(rd.from_pandas(ivs_df), "k", 100)
    assert hot == {"hot"}

    got = run(100)       # hot path engaged for "hot"
    want = run(None)     # plain bucketed path for everything
    assert list(got.columns) == list(want.columns)
    assert len(got) == len(want)
    for c in got.columns:
        assert got[c].fillna(-1).tolist() == want[c].fillna(-1).tolist(), c
    # sanity: the hot key really produced a cross-product-sized result
    assert (got["k"] == "hot").sum() > 1000


# ---------------------------------------------------------------------------
# Dataset-native graph node state (VERDICT #3)
# ---------------------------------------------------------------------------


def _rand_edges(seed=9, n_nodes=150, n_edges=1200):
    import numpy as np

    rng = np.random.default_rng(seed)
    return rd.from_pandas(
        pd.DataFrame(
            {
                "src": rng.integers(0, n_nodes, n_edges),
                "dst": rng.integers(0, n_nodes, n_edges),
            }
        )
    )


def test_pagerank_dataset_state_matches_driver():
    import numpy as np

    from aws_serverless_elt_pipeline_enterprise_ray.functions.graph import pagerank

    ds = _rand_edges()
    a = pagerank(ds, iterations=6, node_state="driver")
    b = pagerank(ds, iterations=6, node_state="dataset")
    m = a.merge(b, on="node", suffixes=("_d", "_s"))
    assert len(m) == len(a)
    assert float(np.abs(m["rank_d"] - m["rank_s"]).max()) < 1e-12
    assert abs(b["rank"].sum() - 1.0) < 1e-9
    # personalized teleport parity too
    a2 = pagerank(ds, iterations=4, node_state="driver", personalization=[3, 7])
    b2 = pagerank(ds, iterations=4, node_state="dataset", personalization=[3, 7])
    m2 = a2.merge(b2, on="node", suffixes=("_d", "_s"))
    assert float(np.abs(m2["rank_d"] - m2["rank_s"]).max()) < 1e-12


def test_label_propagation_dataset_state_matches_driver():
    from aws_serverless_elt_pipeline_enterprise_ray.functions.graph import (
        label_propagation,
    )

    ds = _rand_edges(seed=11)
    a = label_propagation(ds, rounds=4, node_state="driver")
    b = label_propagation(ds, rounds=4, node_state="dataset")
    assert a.equals(b)


def test_bfs_dataset_state_matches_driver():
    from aws_serverless_elt_pipeline_enterprise_ray.functions.graph import (
        bfs_distances,
    )

    ds = _rand_edges(seed=13)
    for kw in ({}, {"directed": True, "max_depth": 3}):
        a = bfs_distances(ds, source=3, node_state="driver", **kw)
        b = bfs_distances(ds, source=3, node_state="dataset", **kw)
        assert a.equals(b), kw


# ---------------------------------------------------------------------------
# real PNG decode (VERDICT #6)
# ---------------------------------------------------------------------------


def test_png_roundtrip_all_filters_and_color_types():
    import numpy as np

    from aws_serverless_elt_pipeline_enterprise_ray.functions.multimodal import (
        decode_image,
        decode_png,
        encode_png,
    )

    rng = np.random.default_rng(3)
    img = rng.integers(0, 256, (23, 17, 3), dtype=np.uint8)
    for f in range(5):
        out = decode_png(encode_png(img, filter_type=f))
        assert out is not None and np.array_equal(out, img), f"filter {f}"
    # grayscale (color type 0) replicates to RGB
    gray = rng.integers(0, 256, (9, 11), dtype=np.uint8)
    out = decode_png(encode_png(gray, color_type=0, filter_type=4))
    assert np.array_equal(out, np.repeat(gray[:, :, None], 3, axis=2))
    # RGBA (color type 6) drops alpha
    rgba = rng.integers(0, 256, (8, 8, 4), dtype=np.uint8)
    out = decode_png(encode_png(rgba, color_type=6, filter_type=2))
    assert np.array_equal(out, rgba[:, :, :3])
    # dispatcher picks PNG up by magic; truncated payloads degrade to None
    assert decode_image(encode_png(img)) is not None
    assert decode_png(encode_png(img)[:40]) is None
    assert decode_png(b"not a png") is None


def test_image_stages_on_real_png_payloads():
    """image features + perceptual dedup over COMPRESSED payloads: the
    decode is real (zlib inflate + defilter), the undecodable-degrade
    path is preserved."""
    import numpy as np

    from aws_serverless_elt_pipeline_enterprise_ray.functions.multimodal import (
        ImageFeatures,
        dhash64,
        encode_png,
    )

    rng = np.random.default_rng(7)
    base = rng.integers(0, 200, (40, 40, 3), dtype=np.uint8)
    brighter = np.clip(base.astype(np.int16) + 40, 0, 255).astype(np.uint8)
    other = rng.integers(0, 256, (40, 40, 3), dtype=np.uint8)
    tbl = pa.table(
        {
            "id": ["a", "a_bright", "b", "bad"],
            "payload": [
                encode_png(base, filter_type=4),
                encode_png(brighter, filter_type=1),
                encode_png(other, filter_type=3),
                b"\x89PNG\r\n\x1a\nbroken",
            ],
        }
    )
    out = ImageFeatures((8, 8))(tbl).to_pandas().set_index("id")
    assert out.loc["a", "decoded"] and out.loc["b", "decoded"]
    assert not out.loc["bad", "decoded"]
    assert out.loc["a", "width"] == 40
    # dHash is brightness-shift invariant: same image brightened hashes
    # identically; a different image does not
    from aws_serverless_elt_pipeline_enterprise_ray.functions.multimodal import (
        decode_image,
    )

    h_a = dhash64(decode_image(encode_png(base, filter_type=4)))
    h_ab = dhash64(decode_image(encode_png(brighter, filter_type=2)))
    h_o = dhash64(decode_image(encode_png(other)))
    assert h_a == h_ab
    assert h_a != h_o


# ---------------------------------------------------------------------------
# multi-round in-flight exchange (VERDICT #5)
# ---------------------------------------------------------------------------


def test_inflight_exchange_matches_sort_and_direct(tmp_path, monkeypatch):
    """Forced multi-round apply: with round_blocks=2 the exchange folds
    each partition's shards many times within one commit; the final
    lake state must be byte-identical to the sort-based and one-shot
    direct exchanges, including quarantine routing."""
    import aws_serverless_elt_pipeline_enterprise_ray as engine
    from aws_serverless_elt_pipeline_enterprise_ray.gen import gen_changes

    from test_cdc_e2e import assert_matches_oracle, final_table

    changes = str(tmp_path / "ch")
    gen_changes(changes, n_events=9000, n_convs=80, n_files=8, seed=51,
                bad_ratio=0.01)
    spec = engine.default_spec(num_partitions=4)
    monkeypatch.setenv("GRAFT_EXCHANGE_FANIN", "2")  # force many rounds

    lakes = {}
    for mode in ("sort", "direct", "inflight"):
        lake = str(tmp_path / f"lake_{mode}")
        ms = engine.apply_changes(changes, lake, spec, exchange=mode)
        lakes[mode] = (lake, ms[-1])
        assert_matches_oracle(lake, changes)

    base = final_table(lakes["sort"][0])
    for mode in ("direct", "inflight"):
        assert final_table(lakes[mode][0]).equals(base), mode
        # quarantine ledger identical in volume
        assert (
            sum(q["rows"] for q in lakes[mode][1].quarantine)
            == sum(q["rows"] for q in lakes["sort"][1].quarantine)
        )


def test_hits_and_kcore_dataset_state_match_driver():
    import numpy as np

    from aws_serverless_elt_pipeline_enterprise_ray.functions.graph import (
        hits,
        k_core,
    )

    ds = _rand_edges(seed=15, n_nodes=120, n_edges=900)
    a = hits(ds, iterations=3, node_state="driver")
    b = hits(ds, iterations=3, node_state="dataset")
    m = a.merge(b, on="node", suffixes=("_d", "_s"))
    assert float(np.abs(m["hub_d"] - m["hub_s"]).max()) < 1e-12
    assert float(np.abs(m["authority_d"] - m["authority_s"]).max()) < 1e-12
    for k in (8, 100):
        assert k_core(ds, k=k, node_state="driver").equals(
            k_core(ds, k=k, node_state="dataset")
        ), k


# ---------------------------------------------------------------------------
# Debezium-envelope changelog reader
# ---------------------------------------------------------------------------


def test_debezium_compat_reader_lands_through_normal_apply(tmp_path):
    """The open CDC wire format: wrapped + unwrapped envelopes, op
    c/u/r/d mapping, before-image for deletes, LSN-preferred sequence,
    poisoned lines quarantined - and the rows land via the SAME
    normalize/apply path as Parquet input."""
    import json

    import aws_serverless_elt_pipeline_enterprise_ray as engine
    from aws_serverless_elt_pipeline_enterprise_ray.sources.changelog import (
        read_changelog_debezium,
    )

    def ev(op, lsn, fields, wrapped=True, use_before=False):
        payload = {
            "op": op,
            "before": fields if use_before else None,
            "after": None if use_before else fields,
            "source": {"lsn": lsn},
            "ts_ms": 1704067200000 + lsn,
        }
        return json.dumps({"payload": payload} if wrapped else payload)

    row = lambda turn, text: {
        "conv_id": "c1", "turn_idx": turn, "role": "assistant",
        "text": text, "tool": None, "ts": "2024-01-01T00:00:0%d Z".replace(" ", "") % min(turn, 9),
    }
    lines = [
        ev("c", 1, row(0, "hi")),
        ev("u", 2, row(0, "hi v2"), wrapped=False),   # unwrapped SMT form
        ev("r", 3, row(1, "snapshot read")),
        ev("d", 4, row(1, "snapshot read"), use_before=True),
        "garbage line",
        json.dumps({"payload": {"op": "c", "after": "not-a-dict"}}),
    ]
    p = tmp_path / "dbz.jsonl"
    p.write_text("\n".join(lines) + "\n")

    ds = read_changelog_debezium([str(p)])
    got = ds.take_all()
    ops = sorted(r.get("op") for r in got)
    assert ops == ["?", "?", "D", "U", "U", "U"]
    by_seq = {r["seq"]: r for r in got if r.get("op") in ("U", "D")}
    assert by_seq[2]["text"] == "hi v2"      # lsn preferred as seq
    assert by_seq[4]["op"] == "D"            # delete from before-image

    lake = str(tmp_path / "lake")
    ms = engine.apply_dataset(
        ds, lake, engine.default_spec(num_partitions=2), label="dbz-1"
    )
    assert ms[-1].metrics["quarantined"] == 2
    final = engine.read_table(lake).to_pandas()
    assert list(final["text"]) == ["hi v2"]  # turn 1 deleted, turn 0 LWW


# ---------------------------------------------------------------------------
# real uncompressed-AVI video frames
# ---------------------------------------------------------------------------


def _build_avi(frames):
    """Hand-assembled RIFF AVI with uncompressed 24-bit '00db' frames."""
    import numpy as np

    h, w = frames[0].shape[:2]
    stride = (w * 3 + 3) & ~3

    def chunk(cid, body):
        pad = b"\x00" if len(body) % 2 else b""
        return cid + len(body).to_bytes(4, "little") + body + pad

    avih = bytearray(56)
    avih[32:36] = w.to_bytes(4, "little")
    avih[36:40] = h.to_bytes(4, "little")
    hdrl = chunk(b"LIST", b"hdrl" + chunk(b"avih", bytes(avih)))
    movi_body = b"movi"
    for f in frames:
        bgr = f[::-1, :, ::-1]  # bottom-up, BGR
        rows = np.zeros((h, stride), np.uint8)
        rows[:, : w * 3] = bgr.reshape(h, w * 3)
        movi_body += chunk(b"00db", rows.tobytes())
    movi = chunk(b"LIST", movi_body)
    body = b"AVI " + hdrl + movi
    return b"RIFF" + len(body).to_bytes(4, "little") + body


def test_avi_decode_and_frame_features():
    import numpy as np

    from aws_serverless_elt_pipeline_enterprise_ray.functions.multimodal import (
        VideoFrameFeatures,
        decode_avi,
        dhash64,
    )

    rng = np.random.default_rng(19)
    frames = [rng.integers(0, 256, (10, 7, 3), dtype=np.uint8) for _ in range(6)]
    avi = _build_avi(frames)
    got = decode_avi(avi)
    assert got is not None and got.shape == (6, 10, 7, 3)
    for i, f in enumerate(frames):
        assert np.array_equal(got[i], f), i

    # the actor stage samples every 2nd frame and hashes each
    tbl = pa.table(
        {
            "media_id": pa.array([1, 2], pa.int64()),
            "payload": pa.array([avi, b"RIFF....AVI broken"], pa.binary()),
        }
    )
    out_t = VideoFrameFeatures(every_nth=2)(tbl)  # stay in Arrow:
    # pandas would widen the nullable int64 hash column to float64
    rows = out_t.to_pylist()
    ok = [r for r in rows if r["media_id"] == 1]
    assert [r["frame_idx"] for r in ok] == [0, 2, 4]
    assert all(r["decoded"] for r in ok)
    want = dhash64(frames[0]) & 0x7FFFFFFFFFFFFFFF
    assert ok[0]["frame_dhash"] == want
    bad = [r for r in rows if r["media_id"] == 2]
    assert len(bad) == 1 and not bad[0]["decoded"]
    # garbage/truncation degrade to None
    assert decode_avi(avi[:40]) is None
    assert decode_avi(b"RIFFxxxxWAVE") is None


# ---------------------------------------------------------------------------
# audio-curation features (silence / clipping / ZCR / spectral centroid)
# ---------------------------------------------------------------------------


def test_audio_quality_features():
    import io
    import wave

    import numpy as np

    from aws_serverless_elt_pipeline_enterprise_ray.functions.multimodal import (
        AudioQuality,
    )

    sr = 8000
    t = np.arange(sr)  # 1 second
    # ~977 Hz tone at half scale (not a divisor of sr, so samples never
    # land exactly on zero), first 10% silenced, last 5% hard-clipped
    tone = (16384 * np.sin(2 * np.pi * 977 * t / sr)).astype(np.int16)
    tone[: sr // 10] = 0
    tone[-sr // 20:] = 32767

    def wav(samples):
        buf = io.BytesIO()
        with wave.open(buf, "wb") as w:
            w.setnchannels(1)
            w.setsampwidth(2)
            w.setframerate(sr)
            w.writeframes(samples.tobytes())
        return buf.getvalue()

    tbl = pa.table(
        {
            "media_id": pa.array([1, 2], pa.int64()),
            "payload": pa.array([wav(tone), b"not audio"], pa.binary()),
        }
    )
    rows = AudioQuality()(tbl).to_pylist()
    ok = rows[0]
    assert ok["decoded"]
    assert 90 <= ok["silence_permille"] <= 140     # 10% + near-crossing dips
    assert 45 <= ok["clip_permille"] <= 55         # ~5% clipped
    # centroid sits between the clip segment's DC mass and the tone
    assert 400 <= ok["spectral_centroid_hz"] <= 1800
    # explicit numpy reference for the centroid
    mono = tone.astype(np.int32)[:, None].sum(axis=1).astype(np.float64)
    mag = np.abs(np.fft.rfft(mono))
    want = int((mag * np.fft.rfftfreq(len(mono), 1 / sr)).sum() / mag.sum())
    assert ok["spectral_centroid_hz"] == want
    # ZCR ~ 2 crossings/cycle over the 90% non-silent, non-clipped span
    assert 1500 <= ok["zero_crossings"] <= 2000
    assert not rows[1]["decoded"]


def test_conversation_windows_cover_and_order():
    """Window/stride coverage: every turn appears in its covering
    windows only, text joins in turn order, null-text turns skipped."""
    from aws_serverless_elt_pipeline_enterprise_ray.functions.transcripts import (
        conversation_windows,
    )

    df = pd.DataFrame(
        {
            "conv_id": ["a"] * 5 + ["b"] * 2,
            "turn_idx": [10, 20, 30, 40, 50, 1, 2],  # gappy numbering
            "text": ["t0", "t1", None, "t3", "t4", "x0", "x1"],
        }
    )
    out = (
        conversation_windows(
            rd.from_pandas(df), window=3, stride=2
        )
        .to_pandas()
        .sort_values(["conv_id", "window_start"])
        .reset_index(drop=True)
    )
    # conv a has 4 non-null turns -> dense ranks 0..3 over t0,t1,t3,t4
    a = out[out["conv_id"] == "a"]
    assert list(a["window_start"]) == [0, 2]
    assert list(a["text"]) == ["t0 t1 t3", "t3 t4"]
    assert list(a["n_turns"]) == [3, 2]
    b = out[out["conv_id"] == "b"]
    assert list(b["text"]) == ["x0 x1"]


def test_chunk_by_sentences_overlap_and_edges():
    from aws_serverless_elt_pipeline_enterprise_ray.functions.text import (
        chunk_by_sentences,
    )

    df = pd.DataFrame(
        {
            "doc_id": [1, 2, 3],
            "text": [
                "A one. B two! C three? D four. E five.",
                "no terminal punctuation here",
                None,
            ],
        }
    )
    out = (
        chunk_by_sentences(rd.from_pandas(df), max_sentences=2, overlap=1)
        .to_pandas()
        .sort_values(["doc_id", "chunk_idx"])
        .reset_index(drop=True)
    )
    # doc 1: 5 sentences, window 2 stride 1 -> 4 windows
    d1 = out[out["doc_id"] == 1]
    assert list(d1["chunk_idx"]) == [0, 1, 2, 3]
    assert d1["n_sentences"].tolist() == [2, 2, 2, 2]
    assert d1["chunk_text"].iloc[0] == "A one. B two!"
    assert d1["chunk_text"].iloc[3] == " D four. E five."
    # docs without a complete sentence yield nothing
    assert set(out["doc_id"]) == {1}


def test_collapse_consecutive_turns_islands():
    from aws_serverless_elt_pipeline_enterprise_ray.functions.transcripts import (
        collapse_consecutive_turns,
    )

    df = pd.DataFrame(
        {
            "conv_id": ["c"] * 6,
            "turn_idx": [0, 1, 2, 3, 4, 5],
            "role": ["user", "assistant", "assistant", "user", "user", "assistant"],
            "text": ["q1", "a1", "a2", "q2a", "q2b", "a3"],
        }
    )
    out = (
        collapse_consecutive_turns(rd.from_pandas(df))
        .to_pandas()
        .sort_values("turn_seq")
        .reset_index(drop=True)
    )
    assert list(out["role"]) == ["user", "assistant", "user", "assistant"]
    assert list(out["n_merged"]) == [1, 2, 2, 1]
    assert out["text"].tolist() == ["q1", "a1\na2", "q2a\nq2b", "a3"]
    assert list(out["turn_seq"]) == [0, 1, 2, 3]


def test_fix_mojibake_repairs_single_and_double_encoding():
    from aws_serverless_elt_pipeline_enterprise_ray.functions.text import (
        fix_mojibake,
    )

    clean = "déjà vu — it's naïve"
    single = clean.encode("utf-8").decode("latin-1")
    double = single.encode("utf-8").decode("latin-1")
    df = pd.DataFrame(
        {
            "doc_id": [1, 2, 3, 4],
            "text": [single, double, clean, "plain ascii"],
        }
    )
    out = (
        fix_mojibake(rd.from_pandas(df))
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert out["text"].tolist() == [clean, clean, clean, "plain ascii"]
    assert out["had_mojibake"].tolist() == [True, True, False, False]


def test_sniff_audio_format_and_coverage():
    """Magic-byte classification + the corpus decode-coverage metric
    (round-3 verdict item 5: measure what the WAV-only path skips)."""
    import io
    import wave

    import ray.data as rd

    from aws_serverless_elt_pipeline_enterprise_ray.functions.multimodal import (
        audio_decode_coverage,
        sniff_audio_format,
    )

    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1); w.setsampwidth(2); w.setframerate(8000)
        w.writeframes(np.zeros(4, np.int16).tobytes())
    wav = buf.getvalue()
    assert sniff_audio_format(wav) == "wav"
    assert sniff_audio_format(b"ID3\x04" + bytes(12)) == "mp3"
    assert sniff_audio_format(b"\xff\xfb\x90\x00") == "mp3"  # MPEG1 L3 sync
    assert sniff_audio_format(b"\xff\xf1\x50\x80") == "aac"  # ADTS
    assert sniff_audio_format(b"OggS" + bytes(8)) == "ogg"
    assert sniff_audio_format(b"fLaC" + bytes(8)) == "flac"
    assert sniff_audio_format(b"\x00\x01\x02\x03") == "unknown"
    assert sniff_audio_format(None) == "unknown"
    assert sniff_audio_format(b"") == "unknown"

    ds = rd.from_items(
        [{"payload": wav}] * 3
        + [{"payload": b"\xff\xfb\x90\x00" + bytes(8)}] * 2
        + [{"payload": b"\xff\xf1\x50\x80" + bytes(8)}]
    )
    cov = audio_decode_coverage(ds)
    got = {r["format"]: (r["n"], r["n_decoded"], r["decode_permille"])
           for _, r in cov.iterrows()}
    assert got == {"wav": (3, 3, 1000), "mp3": (2, 0, 0), "aac": (1, 0, 0)}
