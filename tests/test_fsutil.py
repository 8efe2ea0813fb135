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
