"""MP3 frame-header kernel tests (kernel/mp3x.py)."""

import pytest

from news_rss_spark.kernel.mp3x import parse_mp3_frames, synth_mp3


class TestMp3Kernel:
    def test_cbr_roundtrip(self):
        m = parse_mp3_frames(synth_mp3(5, 44100, 128))
        assert m["n_frames"] == 5 and m["sample_rate"] == 44100
        assert m["bitrate_kbps_min"] == m["bitrate_kbps_max"] == 128
        assert m["vbr"] is False and m["total_samples"] == 5 * 1152
        assert m["version"] == "v1" and m["layer"] == 3
        assert m["has_id3"] is False

    def test_vbr_and_id3_skip(self):
        m = parse_mp3_frames(synth_mp3(4, 32000, [128, 192],
                                       with_id3=True))
        assert m["has_id3"] is True and m["n_frames"] == 4
        assert (m["bitrate_kbps_min"], m["bitrate_kbps_max"]) == (128, 192)
        assert m["vbr"] is True

    def test_frame_length_arithmetic(self):
        # MPEG1 L3: 144 * bitrate / samplerate, no padding in synth
        p = synth_mp3(2, 44100, 128)
        assert len(p) == 2 * (144 * 128000 // 44100)
        p = synth_mp3(3, 32000, 192)
        assert len(p) == 3 * (144 * 192000 // 32000)

    @pytest.mark.parametrize("payload", [
        None, b"", b"\xffgarbage not a frame", b"ID3", b"\xff\xfb"])
    def test_garbage_absent(self, payload):
        m = parse_mp3_frames(payload)
        assert m["n_frames"] is None and m["total_samples"] is None

    def test_truncated_final_frame_not_counted(self):
        p = synth_mp3(3, 44100, 128)
        m = parse_mp3_frames(p[:-1])
        assert m["n_frames"] == 2 and m["total_samples"] == 2 * 1152

    def test_stops_at_invalid_header_no_resync(self):
        p = synth_mp3(2, 44100, 128) + b"JUNK" + synth_mp3(2, 44100, 128)
        assert parse_mp3_frames(p)["n_frames"] == 2

    def test_free_format_and_bad_indices_rejected(self):
        # bitrate index 0 (free) and 15 (invalid), samplerate index 3
        for b2 in (0x00, 0xF0, 0x4C):
            m = parse_mp3_frames(bytes((0xFF, 0xFB, b2, 0x00)) + b"\x00" * 400)
            assert m["n_frames"] is None

    def test_rate_change_midstream_stops(self):
        p = synth_mp3(2, 44100, 128) + synth_mp3(2, 48000, 128)
        m = parse_mp3_frames(p)
        assert m["n_frames"] == 2 and m["sample_rate"] == 44100

    def test_id3_only_payload(self):
        p = synth_mp3(0, 44100, 128, with_id3=True)
        m = parse_mp3_frames(p)
        assert m["has_id3"] is True and m["n_frames"] is None

    def test_synth_validation(self):
        with pytest.raises(ValueError):
            synth_mp3(1, 44000)


class TestMp3Operator:
    def test_stats_match_synthesis_rule(self, spark):
        from news_rss_spark.operators.multimodal import (
            mp3_frame_stats_df, synth_mp3_documents)
        ids = spark.createDataFrame([(i,) for i in range(24)],
                                    "doc_id long")
        got = {r["doc_id"]: r.asDict() for r in mp3_frame_stats_df(
            synth_mp3_documents(ids)).collect()}
        assert len(got) == 24
        for i in range(24):
            r = got[str(i)]
            assert r["has_id3"] == (i % 2 == 0)
            assert r["n_frames"] == 3 + i % 5
            assert r["sample_rate"] == (44100, 48000, 32000)[i % 3]
            assert r["vbr"] == (i % 4 == 0)
            if i % 4 == 0:
                assert (r["bitrate_kbps_min"], r["bitrate_kbps_max"]) \
                    == (128, 192)
            else:
                want = (128, 160, 192)[i % 3]
                assert r["bitrate_kbps_min"] == r["bitrate_kbps_max"] == want
            assert r["total_samples"] == (3 + i % 5) * 1152
