"""Round-4 transcript-curation operators: structural lint,
cross-conversation boilerplate, retry-loop runs, instruction/response
pairs, shared-prefix fork groups, assistant-echo token overlap."""

import pandas as pd
import pytest
import ray.data as rd

from aws_serverless_elt_pipeline_enterprise_ray.functions.transcripts import (
    boilerplate_turns,
    conversation_lint,
    echo_pairs,
    instruction_pairs,
    prefix_fork_groups,
    repeated_turn_runs,
)


def _ds(rows, cols=("conv_id", "turn_idx", "role", "text")):
    return rd.from_pandas(pd.DataFrame(rows, columns=list(cols)))


# ---------------------------------------------------------------------------
# conversation_lint
# ---------------------------------------------------------------------------


def test_conversation_lint_flags():
    ds = _ds(
        [
            # conv a: clean user->assistant dialogue, consecutive turns
            ("a", 1, "user", "hi"),
            ("a", 2, "assistant", "hello"),
            ("a", 3, "user", "do X"),
            ("a", 4, "assistant", "done"),
            # conv b: opens with assistant, double-send, numbering gap
            ("b", 1, "assistant", "yo"),
            ("b", 2, "assistant", "yo again"),
            ("b", 4, "user", "?"),
            # conv c: null text mid-dialogue
            ("c", 1, "user", "q"),
            ("c", 2, "assistant", None),
        ]
    )
    out = (
        conversation_lint(ds, opener_role="user", closer_role="assistant")
        .to_pandas()
        .set_index("conv_id")
        .sort_index()
    )
    a, b, c = out.loc["a"], out.loc["b"], out.loc["c"]
    assert a["ok"] and a["n_turns"] == 4 and a["n_order_gaps"] == 0
    assert a["first_role"] == "user" and a["last_role"] == "assistant"
    assert not b["ok"]
    assert b["first_role"] == "assistant" and b["last_role"] == "user"
    assert b["n_order_gaps"] == 1 and b["n_role_repeats"] == 1
    assert not c["ok"] and c["n_null_text"] == 1 and c["n_role_repeats"] == 0


# ---------------------------------------------------------------------------
# boilerplate_turns
# ---------------------------------------------------------------------------


def test_boilerplate_turns_distinct_conv_threshold():
    ds = _ds(
        [
            ("a", 1, "user", "hi"),
            ("a", 2, "assistant", "hi"),  # same conv twice: 1 conv, 2 occ
            ("b", 1, "user", "hi"),
            ("c", 1, "user", "hi"),
            ("a", 3, "user", "rare"),
            ("b", 2, "user", "twice"),
            ("c", 2, "user", "twice"),
            ("c", 3, "user", None),  # null text excluded
        ]
    )
    out = (
        boilerplate_turns(ds, min_convs=2)
        .to_pandas()
        .set_index("text")
        .sort_index()
    )
    assert set(out.index) == {"hi", "twice"}
    assert out.loc["hi", "n_convs"] == 3
    assert out.loc["hi", "n_occurrences"] == 4
    assert out.loc["twice", "n_convs"] == 2
    assert out.loc["twice", "n_occurrences"] == 2


# ---------------------------------------------------------------------------
# repeated_turn_runs
# ---------------------------------------------------------------------------


def test_repeated_turn_runs_islands():
    ds = _ds(
        [
            ("a", 1, "user", "retry"),
            ("a", 2, "user", "retry"),
            ("a", 3, "user", "retry"),  # run of 3
            ("a", 4, "assistant", "ok"),
            ("a", 5, "user", "retry"),  # interrupted: new island, len 1
            ("b", 1, "user", "x"),
            ("b", 2, "user", "y"),  # same role, different text: no run
        ]
    )
    out = repeated_turn_runs(ds, min_run=2).to_pandas()
    assert len(out) == 1
    r = out.iloc[0]
    assert (r["conv_id"], r["role"], r["text"]) == ("a", "user", "retry")
    assert r["run_len"] == 3 and r["first_ord"] == 1


# ---------------------------------------------------------------------------
# instruction_pairs
# ---------------------------------------------------------------------------


def test_instruction_pairs_adjacency():
    ds = _ds(
        [
            ("a", 1, "user", "q1"),
            ("a", 2, "assistant", "a1"),  # pair
            ("a", 3, "user", "q2"),
            ("a", 4, "user", "q2 again"),  # user->user: q2 skipped
            ("a", 5, "assistant", "a2"),  # pair for q2-again
            ("b", 1, "user", "tail"),  # conversation ends: skipped
            ("c", 1, "user", "t"),
            ("c", 2, "tool", "result"),  # user->tool: skipped
        ]
    )
    out = (
        instruction_pairs(ds, user_role="user", assistant_role="assistant")
        .to_pandas()
        .sort_values(["conv_id", "turn_idx"])
        .reset_index(drop=True)
    )
    assert list(out["prompt"]) == ["q1", "q2 again"]
    assert list(out["response"]) == ["a1", "a2"]
    assert list(out["turn_idx"]) == [1, 4]


# ---------------------------------------------------------------------------
# prefix_fork_groups
# ---------------------------------------------------------------------------


def test_prefix_fork_groups_counts():
    ds = _ds(
        [
            # a and b share the first two turns verbatim (a fork)
            ("a", 1, "user", "sys"),
            ("a", 2, "user", "q"),
            ("a", 3, "assistant", "ans1"),
            ("b", 1, "user", "sys"),
            ("b", 2, "user", "q"),
            ("b", 3, "assistant", "ans2"),
            # c diverges on turn 2
            ("c", 1, "user", "sys"),
            ("c", 2, "user", "other"),
        ]
    )
    out = (
        prefix_fork_groups(ds, prefix_turns=2)
        .to_pandas()
        .set_index("conv_id")
        .sort_index()
    )
    assert out.loc["a", "prefix"] == "sys\nq"
    assert out.loc["a", "n_convs_sharing"] == 2
    assert out.loc["b", "n_convs_sharing"] == 2
    assert out.loc["c", "n_convs_sharing"] == 1


# ---------------------------------------------------------------------------
# echo_pairs
# ---------------------------------------------------------------------------


def test_echo_pairs_token_overlap():
    ds = _ds(
        [
            ("a", 1, "user", "The cat sat"),
            ("a", 2, "assistant", "the CAT ran away"),
            ("a", 3, "user", "a a b"),  # duplicate tokens de-duped
            ("a", 4, "assistant", "b b c"),
            ("b", 1, "user", "solo"),  # no follower: skipped
        ]
    )
    out = (
        echo_pairs(ds, user_role="user", assistant_role="assistant")
        .to_pandas()
        .sort_values("turn_idx")
        .reset_index(drop=True)
    )
    assert len(out) == 2
    first, second = out.iloc[0], out.iloc[1]
    # lowercased: {the, cat, sat} vs {the, cat, ran, away} -> 2 shared
    assert first["n_user_tokens"] == 3
    assert first["n_assistant_tokens"] == 4
    assert first["n_shared"] == 2
    # {a, b} vs {b, c} -> 1 shared
    assert second["n_user_tokens"] == 2
    assert second["n_assistant_tokens"] == 2
    assert second["n_shared"] == 1


# ---------------------------------------------------------------------------
# audio_metadata (header-only scan: wav / flac / mp3 / adts-aac)
# ---------------------------------------------------------------------------


def _mp3_frame(kbps_idx=9, sr_idx=0, pad=0, mode=0):
    from aws_serverless_elt_pipeline_enterprise_ray.functions.multimodal import (
        _MP3_BITRATES,
        _MP3_RATES,
    )

    h = (
        (0x7FF << 21) | (3 << 19) | (1 << 17) | (1 << 16)
        | (kbps_idx << 12) | (sr_idx << 10) | (pad << 9) | (mode << 6)
    )
    size = 144_000 * _MP3_BITRATES[kbps_idx] // _MP3_RATES[sr_idx] + pad
    return h.to_bytes(4, "big") + b"\x00" * (size - 4)


def _adts_frame(sf=4, ch=2, ln=64):
    b = bytearray(7)
    b[0] = 0xFF
    b[1] = 0xF1
    b[2] = (1 << 6) | (sf << 2) | ((ch >> 2) & 1)
    b[3] = ((ch & 3) << 6) | ((ln >> 11) & 3)
    b[4] = (ln >> 3) & 0xFF
    b[5] = ((ln & 7) << 5) | 0x1F
    b[6] = 0xFC
    return bytes(b) + b"\x00" * (ln - 7)


def test_audio_metadata_headers_only():
    import io
    import wave

    import numpy as np

    from aws_serverless_elt_pipeline_enterprise_ray.functions.flac import (
        encode_flac,
    )
    from aws_serverless_elt_pipeline_enterprise_ray.functions.multimodal import (
        audio_metadata,
    )

    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(2)
        w.setsampwidth(2)
        w.setframerate(16000)
        w.writeframes(np.zeros(3200, np.int16).tobytes())
    md = audio_metadata(buf.getvalue())
    assert md == {
        "format": "wav", "n_frames": 1600, "sample_rate": 16000,
        "channels": 2, "duration_ms": 100, "bitrate_kbps": None,
    }

    md = audio_metadata(encode_flac(np.arange(800) % 100, 8000))
    assert (md["format"], md["n_frames"], md["sample_rate"]) == (
        "flac", 800, 8000,
    )
    assert md["duration_ms"] == 100

    # ID3 tag skip + VBR mean bitrate + padding-bit frame advance
    id3 = b"ID3\x04\x00\x00" + bytes([0, 0, 0, 20]) + b"\x00" * 20
    md = audio_metadata(
        id3 + _mp3_frame(9) + _mp3_frame(11) + _mp3_frame(9, 0, 1)
    )
    assert (md["format"], md["n_frames"], md["sample_rate"]) == (
        "mp3", 3, 44100,
    )
    assert md["bitrate_kbps"] == (128 + 192 + 128) // 3
    assert md["duration_ms"] == 3 * 1152 * 1000 // 44100

    md = audio_metadata(_adts_frame() + _adts_frame())
    assert (md["format"], md["n_frames"], md["channels"]) == ("aac", 2, 2)
    assert md["duration_ms"] == 2 * 1024 * 1000 // 44100

    assert audio_metadata(b"junk") is None
    assert audio_metadata(None) is None
    # truncated mp3 sync with no full frame header
    assert audio_metadata(b"\xff\xfb") is None


def _ogg_page(body, granule, seq, header_type=0):
    n_full, rem = divmod(len(body), 255)
    segs = bytes([255] * n_full + [rem])
    hdr = (
        b"OggS" + bytes([0, header_type])
        + granule.to_bytes(8, "little", signed=True)
        + (7).to_bytes(4, "little")  # serial
        + seq.to_bytes(4, "little")
        + b"\x00\x00\x00\x00"  # checksum unverified
        + bytes([len(segs)]) + segs
    )
    return hdr + body


def test_audio_metadata_ogg_vorbis_and_opus():
    from aws_serverless_elt_pipeline_enterprise_ray.functions.multimodal import (
        audio_metadata,
    )

    ident = (
        b"\x01vorbis" + (0).to_bytes(4, "little") + bytes([2])
        + (22050).to_bytes(4, "little") + b"\x00" * 9
    )
    stream = (
        _ogg_page(ident, -1 if False else 0, 0, header_type=2)
        + _ogg_page(b"\x05" * 100, 44100, 1)
        + _ogg_page(b"\x05" * 100, 88200, 2, header_type=4)
    )
    md = audio_metadata(stream)
    assert md == {
        "format": "ogg", "n_frames": 88200, "sample_rate": 22050,
        "channels": 2, "duration_ms": 88200 * 1000 // 22050,
        "bitrate_kbps": None,
    }

    opus_head = (
        b"OpusHead" + bytes([1, 1]) + (312).to_bytes(2, "little")
        + (16000).to_bytes(4, "little") + b"\x00\x00\x00"
    )
    stream = (
        _ogg_page(opus_head, 0, 0, header_type=2)
        + _ogg_page(b"\x05" * 50, 48000 + 312, 1, header_type=4)
    )
    md = audio_metadata(stream)
    # opus granules tick at 48 kHz and include the pre-skip
    assert md["sample_rate"] == 48000
    assert md["n_frames"] == 48000
    assert md["duration_ms"] == 1000
    assert md["channels"] == 1

    # truncated / pageless ogg rejected
    assert audio_metadata(b"OggS\x00\x00") is None


def test_conversation_language_consistency():
    from aws_serverless_elt_pipeline_enterprise_ray.functions.transcripts import (
        conversation_language_consistency,
    )

    ds = _ds(
        [
            # conv a: 2 english turns, 1 spanish -> majority en, 1 minority
            ("a", 1, "user", "the cat and you"),
            ("a", 2, "assistant", "that is the point"),
            ("a", 3, "user", "el gato por los tejados"),
            # conv b: all french -> consistent
            ("b", 1, "user", "le chat pour dans"),
            ("b", 2, "assistant", "être le pour dans ce"),
            # conv c: 1 en / 1 es tie -> priority breaks to en
            ("c", 1, "user", "the and you"),
            ("c", 2, "assistant", "el por los"),
        ]
    )
    out = (
        conversation_language_consistency(ds)
        .to_pandas()
        .set_index("conv_id")
        .sort_index()
    )
    a, b, c = out.loc["a"], out.loc["b"], out.loc["c"]
    assert (a["majority_lang"], a["n_turns"], a["n_minority"]) == ("en", 3, 1)
    assert not a["consistent"]
    assert (b["majority_lang"], b["n_minority"], bool(b["consistent"])) == (
        "fr", 0, True,
    )
    assert c["majority_lang"] == "en" and c["n_minority"] == 1


# ---------------------------------------------------------------------------
# preference_pairs
# ---------------------------------------------------------------------------


def test_preference_pairs_fork_mining():
    from aws_serverless_elt_pipeline_enterprise_ray.functions.transcripts import (
        preference_pairs,
    )

    ds = _ds(
        [
            # three forks off the same opening; c3's response repeats c1's
            ("c1", 1, "user", "tell me a joke"),
            ("c1", 2, "assistant", "joke A"),
            ("c2", 1, "user", "tell me a joke"),
            ("c2", 2, "assistant", "joke B"),
            ("c3", 1, "user", "tell me a joke"),
            ("c3", 2, "assistant", "joke A"),
            # different prefix: no pairs with the group above
            ("d1", 1, "user", "weather?"),
            ("d1", 2, "assistant", "sunny"),
            # fork turn not assistant: excluded by the role filter
            ("e1", 1, "user", "tell me a joke"),
            ("e1", 2, "user", "never mind"),
            # too short: no fork turn at all
            ("f1", 1, "user", "tell me a joke"),
        ]
    )
    out = (
        preference_pairs(
            ds, prefix_turns=1, assistant_role="assistant"
        )
        .to_pandas()
        .sort_values(["conv_a", "conv_b"])
        .reset_index(drop=True)
    )
    # pairs among {c1:A, c2:B, c3:A}: (c1,c2) and (c2,c3) differ; (c1,c3) tie
    assert list(zip(out["conv_a"], out["conv_b"])) == [
        ("c1", "c2"), ("c2", "c3")
    ]
    assert set(out["prefix"]) == {"tell me a joke"}
    assert list(out["response_a"]) == ["joke A", "joke B"]
    assert list(out["response_b"]) == ["joke B", "joke A"]


def test_preference_pairs_max_group_cap():
    from aws_serverless_elt_pipeline_enterprise_ray.functions.transcripts import (
        preference_pairs,
    )

    rows = []
    for i in range(6):  # one 6-conv fork group
        rows += [(f"g{i}", 1, "user", "same opener"),
                 (f"g{i}", 2, "assistant", f"resp {i}")]
    rows += [("h0", 1, "user", "other"), ("h0", 2, "assistant", "x"),
             ("h1", 1, "user", "other"), ("h1", 2, "assistant", "y")]
    ds = _ds(rows)
    out = preference_pairs(
        ds, prefix_turns=1, assistant_role="assistant", max_group=4
    ).to_pandas()
    # the 6-conv group is skipped entirely; the 2-conv group survives
    assert set(out["prefix"]) == {"other"}
    assert len(out) == 1


# ---------------------------------------------------------------------------
# turn_gap_stats
# ---------------------------------------------------------------------------


def test_turn_gap_stats_bursts_and_ooo():
    from aws_serverless_elt_pipeline_enterprise_ray.functions.transcripts import (
        turn_gap_stats,
    )

    t0 = pd.Timestamp("2024-01-01 00:00:00")
    sec = pd.Timedelta(seconds=1)
    ds = _ds(
        [
            # conv a: gaps of 10s, 3600s, -5s (out of order in turn order)
            ("a", 1, None, t0),
            ("a", 2, None, t0 + 10 * sec),
            ("a", 3, None, t0 + 3610 * sec),
            ("a", 4, None, t0 + 3605 * sec),
            # conv b: single turn
            ("b", 1, None, t0),
        ],
        cols=("conv_id", "turn_idx", "role", "ts"),
    )
    out = (
        turn_gap_stats(ds, burst_us=60_000_000)
        .to_pandas()
        .set_index("conv_id")
    )
    a = out.loc["a"]
    assert a["n_turns"] == 4
    assert a["span_us"] == 3610 * 1_000_000
    assert a["max_gap_us"] == 3600 * 1_000_000
    assert a["n_bursts"] == 2  # the 10s gap and the -5s gap
    assert a["n_out_of_order"] == 1
    b = out.loc["b"]
    assert b["n_turns"] == 1 and b["span_us"] == 0 and b["max_gap_us"] == 0
    assert b["n_bursts"] == 0 and b["n_out_of_order"] == 0


# ---------------------------------------------------------------------------
# context_truncate
# ---------------------------------------------------------------------------


def test_context_truncate_budget_and_last_turn():
    from aws_serverless_elt_pipeline_enterprise_ray.functions.transcripts import (
        context_truncate,
    )

    ds = _ds(
        [
            # conv a: 3+3+3 tokens; budget 6 keeps the last two turns
            ("a", 1, "user", "one two three"),
            ("a", 2, "assistant", "four five six"),
            ("a", 3, "user", "seven eight nine"),
            # conv b: the only turn busts the budget but survives
            ("b", 1, "user", "a b c d e f g h i j"),
            # conv c: null text counts 0 tokens
            ("c", 1, "user", None),
            ("c", 2, "assistant", "ok"),
        ]
    )
    out = (
        context_truncate(ds, budget_tokens=6)
        .to_pandas()
        .sort_values(["conv_id", "turn_idx"])
        .reset_index(drop=True)
    )
    a = out[out["conv_id"] == "a"]
    assert list(a["turn_idx"]) == [2, 3]
    assert list(a["cum_tokens_from_end"]) == [6, 3]
    b = out[out["conv_id"] == "b"]
    assert list(b["turn_idx"]) == [1] and b["n_tokens"].iloc[0] == 10
    c = out[out["conv_id"] == "c"]
    assert list(c["turn_idx"]) == [1, 2]
    assert list(c["n_tokens"]) == [0, 1]


# ---------------------------------------------------------------------------
# refusal_screen
# ---------------------------------------------------------------------------


def test_refusal_screen_counts():
    from aws_serverless_elt_pipeline_enterprise_ray.functions.transcripts import (
        refusal_screen,
    )

    ds = _ds(
        [
            ("a", 1, "user", "do something sketchy"),
            ("a", 2, "assistant", "I can't help with that"),
            ("a", 3, "user", "please"),
            ("a", 4, "assistant", "I CANNOT do that"),  # case-insensitive
            ("b", 1, "user", "hi"),
            ("b", 2, "assistant", "hello there"),
            # user turn matching the pattern must NOT count
            ("c", 1, "user", "I can't believe it"),
            ("c", 2, "assistant", "believe it"),
        ]
    )
    out = refusal_screen(ds).to_pandas().set_index("conv_id").sort_index()
    assert out.loc["a", "n_assistant_turns"] == 2
    assert out.loc["a", "n_refusal_turns"] == 2
    assert out.loc["b", "n_refusal_turns"] == 0
    assert out.loc["c", "n_assistant_turns"] == 1
    assert out.loc["c", "n_refusal_turns"] == 0


# ---------------------------------------------------------------------------
# image_metadata (header-only)
# ---------------------------------------------------------------------------


def test_image_metadata_headers_only():
    import numpy as np

    from aws_serverless_elt_pipeline_enterprise_ray.functions.multimodal import (
        encode_png,
        image_metadata,
    )
    from aws_serverless_elt_pipeline_enterprise_ray.functions.webp import (
        encode_webp_lossless,
    )

    # PNG 16-bit grayscale header (hand-built IHDR: depth 16, ctype 0)
    ihdr = (b"\x00\x00\x00\x0dIHDR"
            + (7).to_bytes(4, "big") + (9).to_bytes(4, "big")
            + bytes([16, 0, 0, 0, 0]) + b"\x00" * 4)
    png16 = b"\x89PNG\r\n\x1a\n" + ihdr
    md = image_metadata(png16)
    assert md == {"format": "png", "width": 7, "height": 9,
                  "bit_depth": 16, "channels": 1}

    # real encoders round through the same scan
    md = image_metadata(encode_png(np.zeros((5, 11, 3), np.uint8)))
    assert (md["width"], md["height"], md["channels"]) == (11, 5, 3)
    md = image_metadata(encode_webp_lossless(np.zeros((6, 4, 3), np.uint8)))
    assert md == {"format": "webp", "width": 4, "height": 6,
                  "bit_depth": 8, "channels": 3}

    # progressive JPEG: SOF2 counts like SOF0 in the marker walk
    sof2 = (b"\xff\xc2" + (11).to_bytes(2, "big") + bytes([8])
            + (33).to_bytes(2, "big") + (21).to_bytes(2, "big")
            + bytes([1, 1, 0x11, 0]))
    md = image_metadata(b"\xff\xd8" + sof2)
    assert md == {"format": "jpeg", "width": 21, "height": 33,
                  "bit_depth": 8, "channels": 1}
    # DHT before SOF must be skipped, not parsed as a frame header
    dht = b"\xff\xc4" + (4).to_bytes(2, "big") + b"\x00\x00"
    assert image_metadata(b"\xff\xd8" + dht + sof2)["width"] == 21

    # lossy VP8 keyframe header (start code 9d 01 2a)
    vp8 = (b"\x00\x00\x00" + b"\x9d\x01\x2a"
           + (320).to_bytes(2, "little") + (240).to_bytes(2, "little"))
    riff = (b"RIFF" + (4 + 8 + len(vp8)).to_bytes(4, "little") + b"WEBP"
            + b"VP8 " + len(vp8).to_bytes(4, "little") + vp8)
    md = image_metadata(riff)
    assert (md["format"], md["width"], md["height"]) == ("webp", 320, 240)

    # VP8X canvas dims (24-bit minus-one), alpha flag -> 4 channels
    vp8x = bytes([0x10, 0, 0, 0]) + (99).to_bytes(3, "little") + (49).to_bytes(3, "little")
    riffx = (b"RIFF" + (4 + 8 + len(vp8x)).to_bytes(4, "little") + b"WEBP"
             + b"VP8X" + len(vp8x).to_bytes(4, "little") + vp8x)
    md = image_metadata(riffx)
    assert md == {"format": "webp", "width": 100, "height": 50,
                  "bit_depth": 8, "channels": 4}

    # PGM (P5) single channel, 16-bit maxval
    md = image_metadata(b"P5\n# c\n12 8\n65535\n")
    assert md == {"format": "pgm", "width": 12, "height": 8,
                  "bit_depth": 16, "channels": 1}

    # garbage / truncation degrade to None
    assert image_metadata(b"not an image at all") is None
    assert image_metadata(b"") is None
    assert image_metadata(None) is None
    assert image_metadata(b"\xff\xd8\xff\xd9") is None  # JPEG with no SOF


# ---------------------------------------------------------------------------
# review regressions: null handling in prefixes / gaps / bucketed_agg,
# JPEG fill bytes
# ---------------------------------------------------------------------------


def test_prefix_fork_groups_all_null_prefix_is_sql_null():
    # Two unrelated conversations whose prefix turns are ALL null must
    # NOT be welded into one fork group (SQL string_agg -> NULL joins
    # nothing); a conv with one null among non-null prefix turns keeps
    # string_agg's skip-null semantics.
    ds = _ds(
        [
            ("a", 1, "user", None),
            ("a", 2, "assistant", None),
            ("a", 3, "user", "follow-a"),
            ("b", 1, "user", None),
            ("b", 2, "assistant", None),
            ("b", 3, "user", "follow-b"),
            ("c", 1, "user", None),
            ("c", 2, "assistant", "stem"),
            ("d", 1, "user", "stem"),
            ("d", 2, "assistant", None),
        ]
    )
    out = prefix_fork_groups(ds, prefix_turns=2).to_pandas()
    assert set(out["conv_id"]) == {"c", "d"}  # a, b dropped (NULL prefix)
    assert (out["prefix"] == "stem").all()
    assert (out["n_convs_sharing"] == 2).all()


def test_preference_pairs_null_prefix_excluded():
    from aws_serverless_elt_pipeline_enterprise_ray.functions.transcripts import (
        preference_pairs,
    )

    ds = _ds(
        [
            # null first turns: must not pair with each other
            ("a", 1, "user", None),
            ("a", 2, "assistant", "resp-a"),
            ("b", 1, "user", None),
            ("b", 2, "assistant", "resp-b"),
            # real fork group
            ("c", 1, "user", "q"),
            ("c", 2, "assistant", "r1"),
            ("d", 1, "user", "q"),
            ("d", 2, "assistant", "r2"),
        ]
    )
    out = preference_pairs(ds, prefix_turns=1).to_pandas()
    assert len(out) == 1
    assert out.iloc[0]["conv_a"] == "c" and out.iloc[0]["conv_b"] == "d"


def test_turn_gap_stats_null_ts_excluded():
    from aws_serverless_elt_pipeline_enterprise_ray.functions.transcripts import (
        turn_gap_stats,
    )

    t0 = pd.Timestamp("2024-01-01 00:00:00")
    rows = pd.DataFrame(
        {
            "conv_id": ["a", "a", "a", "z", "z"],
            "turn_idx": [1, 2, 3, 1, 2],
            "ts": [t0, pd.NaT, t0 + pd.Timedelta(seconds=120), pd.NaT, pd.NaT],
        }
    )
    out = (
        turn_gap_stats(rd.from_pandas(rows), burst_us=60_000_000)
        .to_pandas()
        .set_index("conv_id")
    )
    a = out.loc["a"]
    # span over NON-null ts = 120s; the (t0, NaT) and (NaT, t2) adjacent
    # pairs contribute no gap, no burst, no out-of-order
    assert a["n_turns"] == 3
    assert a["span_us"] == 120_000_000
    assert a["max_gap_us"] == 0  # no adjacent pair has both ts present
    assert a["n_bursts"] == 0 and a["n_out_of_order"] == 0
    z = out.loc["z"]
    assert z["n_turns"] == 2 and pd.isna(z["span_us"])  # SQL NULL span
    assert z["max_gap_us"] == 0


def test_bucketed_agg_keeps_null_keys():
    from aws_serverless_elt_pipeline_enterprise_ray.functions.windows import (
        bucketed_agg,
    )

    df = pd.DataFrame(
        {
            "k": ["x", None, "x", None, "y"],
            "v": [1, 10, 2, 20, 5],
        }
    )
    out = bucketed_agg(
        rd.from_pandas(df), "k", {"v": "sum", "n": "count"}, nb=4
    ).to_pandas()
    bykey = {(None if pd.isna(k) else k): (v, n)
             for k, v, n in zip(out["k"], out["v"], out["n"])}
    assert bykey == {"x": (3, 2), None: (30, 2), "y": (5, 1)}


def test_image_metadata_jpeg_fill_bytes():
    from aws_serverless_elt_pipeline_enterprise_ray.functions.multimodal import (
        image_metadata,
    )

    sof0 = (b"\xff\xc0" + (11).to_bytes(2, "big") + bytes([8])
            + (17).to_bytes(2, "big") + (13).to_bytes(2, "big")
            + bytes([3, 1, 0x22, 0]))
    # spec-legal 0xFF fill bytes before the marker must be skipped
    md = image_metadata(b"\xff\xd8" + b"\xff\xff\xff" + sof0)
    assert md == {"format": "jpeg", "width": 13, "height": 17,
                  "bit_depth": 8, "channels": 3}


# ---------------------------------------------------------------------------
# agent-trajectory operators: tool usage profile, tool transitions
# ---------------------------------------------------------------------------


def test_tool_usage_stats_loops_and_ties():
    from aws_serverless_elt_pipeline_enterprise_ray.functions.transcripts import (
        tool_usage_stats,
    )

    ds = _ds(
        [
            # conv a: search x3 consecutively (a stuck loop), fetch once;
            # the assistant turn between calls must NOT break the run
            ("a", 1, "user", None),
            ("a", 2, "tool", "search"),
            ("a", 3, "assistant", None),
            ("a", 4, "tool", "search"),
            ("a", 5, "tool", "search"),
            ("a", 6, "tool", "fetch"),
            # conv b: tie between fetch and search -> name order wins
            ("b", 1, "tool", "search"),
            ("b", 2, "tool", "fetch"),
            # conv c: no tool turns at all
            ("c", 1, "user", None),
        ],
        cols=("conv_id", "turn_idx", "role", "tool"),
    )
    out = (
        tool_usage_stats(ds, conv_col="conv_id", order_col="turn_idx",
                         tool_col="tool")
        .to_pandas()
        .set_index("conv_id")
    )
    a = out.loc["a"]
    assert a["n_turns"] == 6 and a["n_tool_turns"] == 4
    assert a["n_distinct_tools"] == 2 and a["top_tool"] == "search"
    assert a["max_tool_run"] == 3
    b = out.loc["b"]
    assert b["top_tool"] == "fetch" and b["max_tool_run"] == 1
    c = out.loc["c"]
    assert c["n_tool_turns"] == 0 and c["max_tool_run"] == 0
    assert pd.isna(c["top_tool"])


def test_tool_transitions_adjacency():
    from aws_serverless_elt_pipeline_enterprise_ray.functions.transcripts import (
        tool_transitions,
    )

    ds = _ds(
        [
            # a: search -> search -> fetch (two transitions)
            ("a", 1, "tool", "search"),
            ("a", 2, "tool", "search"),
            ("a", 3, "tool", "fetch"),
            # b: search -> fetch; conversation boundaries never pair
            ("b", 1, "tool", "search"),
            ("b", 2, "tool", "fetch"),
            # c: single tool turn -> no transition
            ("c", 1, "tool", "run"),
        ],
        cols=("conv_id", "turn_idx", "role", "tool"),
    )
    out = (
        tool_transitions(ds, conv_col="conv_id", order_col="turn_idx",
                         tool_col="tool")
        .to_pandas()
    )
    got = {(f, t): n for f, t, n in
           zip(out["tool_from"], out["tool_to"], out["n"])}
    assert got == {("search", "search"): 1, ("search", "fetch"): 2}


def test_fork_best_of_n_selection():
    from aws_serverless_elt_pipeline_enterprise_ray.functions.transcripts import (
        fork_best_of_n,
    )

    ds = _ds(
        [
            # fork group "q": c wins on length; tie d/e -> d (conv asc)
            ("c", 1, "user", "q"),
            ("c", 2, "assistant", "long answer"),
            ("d", 1, "user", "q"),
            ("d", 2, "assistant", "short"),
            ("e", 1, "user", "q"),
            ("e", 2, "assistant", "brief"),
            # all-null prefix: excluded entirely (SQL NULL)
            ("f", 1, "user", None),
            ("f", 2, "assistant", "resp"),
            # singleton group
            ("g", 1, "user", "solo"),
            ("g", 2, "assistant", "only"),
        ]
    )
    out = (
        fork_best_of_n(ds, prefix_turns=1)
        .to_pandas()
        .set_index("prefix")
        .sort_index()
    )
    assert set(out.index) == {"q", "solo"}
    q = out.loc["q"]
    assert q["conv_id"] == "c" and q["score"] == len("long answer")
    assert q["n_candidates"] == 3
    assert out.loc["solo"]["conv_id"] == "g"
    assert out.loc["solo"]["n_candidates"] == 1


def test_fork_best_of_n_score_col_and_ties():
    from aws_serverless_elt_pipeline_enterprise_ray.functions.transcripts import (
        fork_best_of_n,
    )

    df = pd.DataFrame(
        {
            "conv_id": ["a", "a", "b", "b"],
            "turn_idx": [1, 2, 1, 2],
            "text": ["p", "x", "p", "y"],
            "sc": [0, 7, 0, 7],  # tie on score -> conv asc wins
        }
    )
    out = fork_best_of_n(
        rd.from_pandas(df), prefix_turns=1, score_col="sc"
    ).to_pandas()
    assert len(out) == 1
    assert out.iloc[0]["conv_id"] == "a" and out.iloc[0]["score"] == 7
    assert out.iloc[0]["n_candidates"] == 2


def test_tool_ops_null_conv_is_one_group():
    # SQL GROUP BY / PARTITION BY treat NULL conv as one group: the
    # profile emits a null-conv row and its transitions count.
    from aws_serverless_elt_pipeline_enterprise_ray.functions.transcripts import (
        tool_transitions,
        tool_usage_stats,
    )

    df = pd.DataFrame(
        {
            "conv_id": ["a", None, None, None],
            "turn_idx": [1, 1, 2, 3],
            "role": ["tool"] * 4,
            "tool": ["run", "search", "search", "fetch"],
        }
    )
    out = tool_usage_stats(
        rd.from_pandas(df), conv_col="conv_id", order_col="turn_idx",
        tool_col="tool",
    ).to_pandas()
    assert len(out) == 2
    nullrow = out[out["conv_id"].isna()].iloc[0]
    assert nullrow["n_turns"] == 3 and nullrow["n_tool_turns"] == 3
    assert nullrow["top_tool"] == "search" and nullrow["max_tool_run"] == 2

    tr = tool_transitions(
        rd.from_pandas(df), conv_col="conv_id", order_col="turn_idx",
        tool_col="tool",
    ).to_pandas()
    got = {(f, t): n for f, t, n in
           zip(tr["tool_from"], tr["tool_to"], tr["n"])}
    assert got == {("search", "search"): 1, ("search", "fetch"): 1}


def test_fork_best_of_n_null_scores_rank_last():
    from aws_serverless_elt_pipeline_enterprise_ray.functions.transcripts import (
        fork_best_of_n,
    )

    df = pd.DataFrame(
        {
            "conv_id": ["a", "a", "b", "b", "c", "c"],
            "turn_idx": [1, 2, 1, 2, 1, 2],
            "text": ["p", "x", "p", "y", "p", "z"],
            "sc": pd.array([None, None, None, 5, None, None], dtype="Int64"),
        }
    )
    # fork scores: a=None, b=5, c=None -> b wins (nulls rank last,
    # like DuckDB's NULLS LAST under DESC); no crash on the null cast
    out = fork_best_of_n(
        rd.from_pandas(df), prefix_turns=1, score_col="sc"
    ).to_pandas()
    assert len(out) == 1
    assert out.iloc[0]["conv_id"] == "b" and out.iloc[0]["score"] == 5
    assert out.iloc[0]["n_candidates"] == 3


# ---------------------------------------------------------------------------
# fork_advantage / fork_pass_rate / retry_edit_distance
# ---------------------------------------------------------------------------


def test_fork_advantage_group_relative():
    from aws_serverless_elt_pipeline_enterprise_ray.functions.transcripts import (
        fork_advantage,
    )

    df = pd.DataFrame(
        {
            "conv_id": ["a", "a", "b", "b", "c", "c", "g", "g"],
            "turn_idx": [1, 2, 1, 2, 1, 2, 1, 2],
            "text": ["p", "x", "p", "y", "p", "z", "solo", "w"],
            "sc": [0, 10, 0, 4, 0, 1, 0, 5],
        }
    )
    out = (
        fork_advantage(rd.from_pandas(df), prefix_turns=1, score_col="sc")
        .to_pandas()
        .set_index("conv_id")
    )
    # group "p": scores 10,4,1 -> mean 5 -> advantages 5,-1,-4
    assert out.loc["a"]["advantage"] == pytest.approx(5.0)
    assert out.loc["b"]["advantage"] == pytest.approx(-1.0)
    assert out.loc["c"]["advantage"] == pytest.approx(-4.0)
    assert (out.loc[["a", "b", "c"]]["n_candidates"] == 3).all()
    # singleton group: advantage exactly 0
    assert out.loc["g"]["advantage"] == 0.0
    assert out.loc["g"]["n_candidates"] == 1


def test_fork_advantage_null_scores_excluded():
    from aws_serverless_elt_pipeline_enterprise_ray.functions.transcripts import (
        fork_advantage,
    )

    df = pd.DataFrame(
        {
            "conv_id": ["a", "a", "b", "b", "c", "c"],
            "turn_idx": [1, 2, 1, 2, 1, 2],
            "text": ["p", "x", "p", "y", "p", "z"],
            "sc": [0, 6, 0, None, 0, 2],
        }
    )
    out = fork_advantage(
        rd.from_pandas(df), prefix_turns=1, score_col="sc"
    ).to_pandas()
    # b's null score drops it; group stats over the remaining 2
    assert set(out["conv_id"]) == {"a", "c"}
    assert (out["n_candidates"] == 2).all()
    a = out.set_index("conv_id").loc["a"]
    assert a["advantage"] == pytest.approx(2.0)  # 6 - mean(6,2)


def test_fork_pass_rate_threshold():
    from aws_serverless_elt_pipeline_enterprise_ray.functions.transcripts import (
        fork_pass_rate,
    )

    df = pd.DataFrame(
        {
            "conv_id": ["a", "a", "b", "b", "c", "c"],
            "turn_idx": [1, 2, 1, 2, 1, 2],
            "text": ["p", "x", "p", "y", "p", "z"],
            "sc": [0, 8, 0, 3, 0, 5],
        }
    )
    out = fork_pass_rate(
        rd.from_pandas(df), prefix_turns=1, score_col="sc", threshold=5
    ).to_pandas()
    assert len(out) == 1
    r = out.iloc[0]
    assert r["n_candidates"] == 3 and r["n_pass"] == 2
    assert r["pass_rate"] == pytest.approx(2 / 3)


def test_retry_edit_distance_pairs_and_values():
    from aws_serverless_elt_pipeline_enterprise_ray.functions.transcripts import (
        retry_edit_distance,
    )

    ds = _ds(
        [
            # consecutive same-role pair: kitten -> sitting (dist 3)
            ("c1", 1, "assistant", "kitten"),
            ("c1", 2, "assistant", "sitting"),
            # role changes: no pair
            ("c1", 3, "user", "kitten"),
            # verbatim resend: dist 0
            ("c2", 1, "user", "hi"),
            ("c2", 2, "user", "hi"),
            # null text on either side: no pair
            ("c3", 1, "user", None),
            ("c3", 2, "user", "x"),
            ("c3", 3, "user", None),
        ]
    )
    out = (
        retry_edit_distance(ds)
        .to_pandas()
        .sort_values(["conv_id", "turn_idx"])
        .reset_index(drop=True)
    )
    assert len(out) == 2
    assert out.iloc[0]["conv_id"] == "c1" and out.iloc[0]["dist"] == 3
    assert out.iloc[0]["len_prev"] == 6 and out.iloc[0]["len_next"] == 7
    assert out.iloc[1]["conv_id"] == "c2" and out.iloc[1]["dist"] == 0


def test_levenshtein_bytes_matches_utf8_byte_semantics():
    from aws_serverless_elt_pipeline_enterprise_ray.functions.transcripts import (
        _levenshtein_bytes,
    )

    # DuckDB's levenshtein() is byte-level on UTF-8 (probed on 1.0.0):
    # 'café' vs 'cafe' = 2 (é is 2 bytes), not the codepoint answer 1
    assert _levenshtein_bytes("café".encode(), "cafe".encode()) == 2
    assert _levenshtein_bytes("日本".encode(), "日木".encode()) == 1
    assert _levenshtein_bytes(b"", b"abc") == 3
    assert _levenshtein_bytes(b"ab", b"ba") == 2
    assert _levenshtein_bytes(b"same", b"same") == 0


def test_pseudonymize_deterministic_and_null_safe():
    import hashlib

    from aws_serverless_elt_pipeline_enterprise_ray.functions.text import (
        pseudonymize,
    )

    df = pd.DataFrame(
        {
            "conv_id": ["c1", "c2", "c1", None],
            "other": [1, 2, 3, 4],
        }
    )
    out = (
        pseudonymize(rd.from_pandas(df), ["conv_id"], key="k1")
        .to_pandas()
        .sort_values("other")
        .reset_index(drop=True)
    )
    want = hashlib.md5(b"k1|c1").hexdigest()
    # referential integrity: same input -> same token
    assert out.loc[0, "conv_id"] == want and out.loc[2, "conv_id"] == want
    assert out.loc[1, "conv_id"] != want
    assert out.loc[3, "conv_id"] is None or pd.isna(out.loc[3, "conv_id"])
    # a different key gives different tokens
    out2 = pseudonymize(
        rd.from_pandas(df), ["conv_id"], key="k2"
    ).to_pandas()
    assert set(out2["conv_id"].dropna()) != set(out["conv_id"].dropna())


def test_levenshtein_bytes_fuzz_vs_duckdb():
    import random

    import duckdb

    from aws_serverless_elt_pipeline_enterprise_ray.functions.transcripts import (
        _levenshtein_bytes,
    )

    rng = random.Random(7)
    alpha = "abcdé日x "
    con = duckdb.connect()
    for _ in range(120):
        a = "".join(rng.choice(alpha) for _ in range(rng.randint(0, 12)))
        b = "".join(rng.choice(alpha) for _ in range(rng.randint(0, 12)))
        want = con.execute(
            "select levenshtein(?, ?)", [a, b]
        ).fetchone()[0]
        assert _levenshtein_bytes(a.encode(), b.encode()) == want, (a, b)


def test_fork_advantage_zscore_normalization():
    import math

    from aws_serverless_elt_pipeline_enterprise_ray.functions.transcripts import (
        fork_advantage,
    )

    df = pd.DataFrame(
        {
            "conv_id": ["a", "a", "b", "b", "c", "c", "g", "g", "h", "h"],
            "turn_idx": [1, 2, 1, 2, 1, 2, 1, 2, 1, 2],
            "text": ["p", "x", "p", "y", "p", "z", "q", "w", "q", "v"],
            # group p: 10,4,1 (mean 5, var (25+1+16)/3=14)
            # group q: 3,3 -> zero variance
            "sc": [0, 10, 0, 4, 0, 1, 0, 3, 0, 3],
        }
    )
    out = (
        fork_advantage(
            rd.from_pandas(df), prefix_turns=1, score_col="sc",
            normalize="std",
        )
        .to_pandas()
        .set_index("conv_id")
    )
    std = math.sqrt(14)
    assert out.loc["a"]["advantage"] == pytest.approx(5 / std)
    assert out.loc["b"]["advantage"] == pytest.approx(-1 / std)
    assert out.loc["c"]["advantage"] == pytest.approx(-4 / std)
    # zero-variance group: GRPO convention advantage 0
    assert out.loc["g"]["advantage"] == 0.0
    assert out.loc["h"]["advantage"] == 0.0
    with pytest.raises(ValueError):
        fork_advantage(rd.from_pandas(df), normalize="bogus")


def test_discounted_returns_values_and_validation():
    from aws_serverless_elt_pipeline_enterprise_ray.functions.transcripts import (
        discounted_returns,
    )

    df = pd.DataFrame(
        {
            "conv_id": ["a", "a", "a", "b", "b"],
            "turn_idx": [1, 2, 3, 1, 2],
            "reward": [4, 2, 8, 1, None],
        }
    )
    out = (
        discounted_returns(
            rd.from_pandas(df), reward_col="reward", gamma=0.5, horizon=16
        )
        .to_pandas()
        .sort_values(["conv_id", "turn_idx"])
        .reset_index(drop=True)
    )
    # a: ret_1 = 4 + 2/2 + 8/4 = 7; ret_2 = 2 + 8/2 = 6; ret_3 = 8
    a = out[out["conv_id"] == "a"]["ret"].tolist()
    assert a == [7.0, 6.0, 8.0]
    # b: null-reward turn excluded entirely -> only turn 1, ret = 1
    b = out[out["conv_id"] == "b"]
    assert len(b) == 1 and b.iloc[0]["ret"] == 1.0
    # bounded horizon: gamma=0.5 horizon=1 -> ret_1 = 4 + 1 = 5
    out2 = (
        discounted_returns(
            rd.from_pandas(df), reward_col="reward", gamma=0.5, horizon=1
        )
        .to_pandas()
    )
    r1 = out2[(out2["conv_id"] == "a") & (out2["turn_idx"] == 1)]
    assert r1.iloc[0]["ret"] == 5.0
    with pytest.raises(ValueError):
        discounted_returns(rd.from_pandas(df), gamma=0.3)
    with pytest.raises(ValueError):
        discounted_returns(rd.from_pandas(df), horizon=-1)


def test_distinct_ngram_stats_counts():
    import pandas as pd
    import ray.data as rd

    from aws_serverless_elt_pipeline_enterprise_ray.functions.text import distinct_ngram_stats

    docs = pd.DataFrame({"text": ["a b a b", "a b", "x", None, ""]})
    out = distinct_ngram_stats(rd.from_pandas(docs), ns=(1, 2, 3)).to_pandas()
    out = out.set_index("n")
    # unigrams: a b a b | a b | x -> 7 total, 3 distinct
    assert out.loc[1, "total_ngrams"] == 7 and out.loc[1, "distinct_ngrams"] == 3
    # bigrams: (a b)(b a)(a b) + (a b) -> 4 total, 2 distinct; 'x' row none
    assert out.loc[2, "total_ngrams"] == 4 and out.loc[2, "distinct_ngrams"] == 2
    # trigrams: (a b a)(b a b) -> 2 total, 2 distinct
    assert out.loc[3, "total_ngrams"] == 2 and out.loc[3, "distinct_ngrams"] == 2
