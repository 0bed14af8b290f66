"""Raw-file ingestion sources (binaryFile blobs + text shards)."""

from __future__ import annotations

from pywrangler_spark.sources import read_binary_files, read_text_shards


class TestBinaryFiles:
    def test_blob_schema_and_content(self, spark, tmp_path):
        (tmp_path / "a.png").write_bytes(b"\x89PNG-fake")
        (tmp_path / "b.wav").write_bytes(b"RIFF-fake-audio")
        out = read_binary_files(spark, str(tmp_path)).orderBy("path")
        rows = out.collect()
        assert [r.blob_meta.format for r in rows] == ["png", "wav"]
        assert [bytes(r.blob) for r in rows] == [
            b"\x89PNG-fake",
            b"RIFF-fake-audio",
        ]
        assert [r.n_bytes for r in rows] == [9, 15]
        assert all(r.blob_meta.n_bytes == r.n_bytes for r in rows)
        # deterministic id: re-reading yields the same blob_ids
        again = {r.path: r.blob_id for r in
                 read_binary_files(spark, str(tmp_path)).collect()}
        assert {r.path: r.blob_id for r in rows} == again

    def test_glob_and_max_bytes(self, spark, tmp_path):
        (tmp_path / "keep.png").write_bytes(b"x" * 10)
        (tmp_path / "skip.txt").write_bytes(b"y" * 10)
        (tmp_path / "huge.png").write_bytes(b"z" * 1000)
        out = read_binary_files(
            spark, str(tmp_path), glob="*.png", max_bytes=100
        ).collect()
        assert len(out) == 1
        assert out[0].path.endswith("keep.png")

    def test_extensionless_format(self, spark, tmp_path):
        (tmp_path / "noext").write_bytes(b"data")
        out = read_binary_files(spark, str(tmp_path)).collect()
        assert out[0].blob_meta.format == "bin"


class TestTextShards:
    def test_line_mode(self, spark, tmp_path):
        (tmp_path / "s1.txt").write_text("alpha\n\nbeta\n")
        (tmp_path / "s2.txt").write_text("gamma\n")
        out = read_text_shards(spark, str(tmp_path))
        rows = sorted(out.collect(), key=lambda r: r.text)
        assert [r.text for r in rows] == ["alpha", "beta", "gamma"]
        assert rows[0].source.endswith("s1.txt")
        assert rows[2].source.endswith("s2.txt")
        # empty line dropped; ids deterministic across re-reads
        again = {(r.source, r.text): r.doc_id
                 for r in read_text_shards(spark, str(tmp_path)).collect()}
        assert {(r.source, r.text): r.doc_id for r in rows} == again
        # distinct (file, line) pairs get distinct ids
        assert len({r.doc_id for r in rows}) == 3

    def test_whole_files(self, spark, tmp_path):
        (tmp_path / "d1.txt").write_text("line one\nline two\n")
        out = read_text_shards(spark, str(tmp_path), whole_files=True)
        rows = out.collect()
        assert len(rows) == 1
        assert "line one\nline two" in rows[0].text

    def test_glob(self, spark, tmp_path):
        (tmp_path / "a.jsonl").write_text("j1\n")
        (tmp_path / "b.txt").write_text("t1\n")
        rows = read_text_shards(
            spark, str(tmp_path), glob="*.jsonl"
        ).collect()
        assert [r.text for r in rows] == ["j1"]
