"""ID3 tag kernel tests (kernel/id3x.py)."""

import pytest

from news_rss_spark.kernel.id3x import extract_id3, synth_id3_mp3


class TestId3:
    @pytest.mark.parametrize("version,want_ver", [
        ("v2.3", "id3v2.3"), ("v2.4", "id3v2.4"), ("v1", "id3v1")])
    def test_roundtrip_all_versions(self, version, want_ver):
        p = synth_id3_mp3("Song", "Artist", "Album", "1999",
                          version=version)
        m = extract_id3(p)
        assert m == {"title": "Song", "artist": "Artist",
                     "album": "Album", "year": "1999",
                     "tag_version": want_ver}

    def test_unicode_v24(self):
        m = extract_id3(synth_id3_mp3("Tèst é", version="v2.4"))
        assert m["title"] == "Tèst é"

    def test_garbage_and_absent(self):
        assert extract_id3(None)["title"] is None
        assert extract_id3(b"\xffjust audio bytes")["title"] is None
        p = synth_id3_mp3()
        assert extract_id3(p[:6])["title"] is None  # truncated header

    def test_v1_space_padded(self):
        tag = (b"TAG" + b"Padded Title".ljust(30, b" ")
               + b"".ljust(30, b"\x00") + b"".ljust(30, b"\x00")
               + b"2001" + b"\x00" * 31)
        m = extract_id3(b"x" + tag)
        assert m["title"] == "Padded Title"
        assert m["artist"] is None and m["year"] == "2001"

    def test_first_frame_wins(self):
        import struct
        f = (b"TIT2" + struct.pack(">I", 3) + b"\x00\x00" + b"\x00ab"
             + b"TIT2" + struct.pack(">I", 3) + b"\x00\x00" + b"\x00cd")
        n = len(f)
        p = (b"ID3\x03\x00\x00"
             + bytes(((n >> 21) & 0x7F, (n >> 14) & 0x7F,
                      (n >> 7) & 0x7F, n & 0x7F)) + f)
        assert extract_id3(p)["title"] == "ab"
