"""The shared local-vs-remote path split (fsutil.local_root): everything
not provably local must route to the Hadoop FS — an os-level listing of
a misclassified path "succeeds" with empty results, the silent failure
class of VERDICT r10's top directive."""

from __future__ import annotations

from demo_otel_parquet_antalya_spark.fsutil import local_root


def test_local_forms():
    assert local_root("/data/rollup") == "/data/rollup"
    assert local_root("relative/dir") == "relative/dir"
    assert local_root("file:/data/rollup") == "/data/rollup"
    assert local_root("file:///data/rollup") == "/data/rollup"
    assert local_root("file://localhost/data/rollup") == "/data/rollup"


def test_remote_and_unprovable_forms_route_to_hadoop():
    # real remote schemes
    assert local_root("s3a://bucket/rollup") is None
    assert local_root("hdfs://nn:8020/rollup") is None
    # a file URI with a REAL authority: folding the host into the path
    # would list the wrong (empty) local directory (code-review r11)
    assert local_root("file://somehost/data/rollup") is None
    # relative file: form — meaning is resolver-dependent, err remote
    assert local_root("file:relative/dir") is None
    # single-slash scheme forms (s3a:/x) are NOT local paths
    assert local_root("s3a:/bucket/rollup") is None
    assert local_root("nosuchfs:/x") is None


def test_hadoop_text_roundtrip_and_absent(spark, tmp_path):
    """The trim-marker IO's remote twin, exercised through the Hadoop
    local FS via a file:// URI that local_root classifies REMOTE (real
    authority is not needed — file:/// routes local, so force the Hadoop
    branch with the URI form the helpers receive verbatim)."""
    from demo_otel_parquet_antalya_spark.fsutil import (
        hadoop_read_text,
        hadoop_write_text,
    )

    p = f"file://{tmp_path}/marker/_trim_boundary.json"
    assert hadoop_read_text(spark, p) is None  # absent -> None, not error
    hadoop_write_text(spark, p, '{"epoch": 100, "align_s": 300}')
    assert hadoop_read_text(spark, p) == '{"epoch": 100, "align_s": 300}'
    hadoop_write_text(spark, p, "overwritten")  # create(overwrite=True)
    assert hadoop_read_text(spark, p) == "overwritten"


def test_trim_marker_io_takes_the_hadoop_branch_for_remote_roots(spark, tmp_path, monkeypatch):
    """read/write_trim_boundary on a root local_root cannot prove local
    must go through the Hadoop helpers (the r11 _versions discipline)."""
    from demo_otel_parquet_antalya_spark.streaming import rollup as R

    calls = []
    real_write, real_read = R.hadoop_write_text, R.hadoop_read_text

    def spy_write(sp, path, text):
        calls.append(("w", path))
        return real_write(sp, path.replace("file://fakehost", f"file://{tmp_path}"), text)

    def spy_read(sp, path):
        calls.append(("r", path))
        return real_read(sp, path.replace("file://fakehost", f"file://{tmp_path}"), )

    monkeypatch.setattr(R, "hadoop_write_text", spy_write)
    monkeypatch.setattr(R, "hadoop_read_text", spy_read)
    root = "file://fakehost/rollup"  # real authority -> remote branch
    import os

    os.makedirs(f"{tmp_path}/rollup/v=7", exist_ok=True)
    R._write_trim_marker(spark, root, 7, 600, 300)
    assert R.read_trim_boundary(spark, root, 7) == (600, 300)
    assert [c[0] for c in calls] == ["w", "r"]
    assert all("fakehost/rollup/v=7/_trim_boundary.json" in c[1] for c in calls)
