"""A6 dump sink: TSV part-files + md5 integrity sidecar."""

import hashlib
import json
import os

from tiny_search_engine_spark.export import dump_fwd_table, dump_inv_table


def test_dump_and_integrity(spark, tiny_store, tmp_path):
    fwd = dump_fwd_table(spark, tiny_store, str(tmp_path / "fwd"))
    inv = dump_inv_table(spark, tiny_store, str(tmp_path / "inv"))
    for d in (fwd, inv):
        with open(os.path.join(d, "_integrity.json")) as f:
            integ = json.load(f)
        assert integ["files"], d
        for name, want in integ["files"].items():
            h = hashlib.md5(open(os.path.join(d, name), "rb").read()).hexdigest()
            assert h == want
    # spot-check content shape
    lines = []
    for name in os.listdir(inv):
        if name.endswith(".csv"):
            lines += open(os.path.join(inv, name)).read().splitlines()
    assert lines
    cols = lines[0].split("\t")
    assert len(cols) == 4
    float(cols[1])  # idf parses
