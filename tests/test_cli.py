"""Drive the CLI drivers end-to-end on tiny synthetic data."""
import json
import os

import numpy as np
import pytest

from lgcnhs_tpu.cli import evaluate as evaluate_cli
from lgcnhs_tpu.cli import find_lambda as find_lambda_cli
from lgcnhs_tpu.cli import main as main_cli

SMALL = [
    "--dataset", "synthetic", "--env", "dev",
    "--users", "50", "--items", "80", "--interactions", "2000",
    "--epochs", "12",
]


def test_main_spread_model(tmp_path):
    metrics = main_cli.main(
        SMALL + ["--model", "HybridS", "--workdir", str(tmp_path)]
    )
    assert set(metrics) == {"P", "R", "F1", "NDCG", "H", "I"}
    assert all(np.isfinite(v) for v in metrics.values())
    # recommendation cache artifact exists
    rec_dir = os.path.join(str(tmp_path), "synthetic", "recommend")
    assert any(f.endswith(".npy") for f in os.listdir(rec_dir))


def test_main_full_lgcnhs_and_cache_roundtrip(tmp_path):
    argv = SMALL + ["--model", "SpreadLightGCNOpti", "--workdir", str(tmp_path)]
    m1 = main_cli.main(argv)
    # second run must hit the recommendation cache and reproduce metrics
    m2 = main_cli.main(argv)
    assert m1 == m2


def test_main_lightgcn(tmp_path):
    metrics = main_cli.main(
        SMALL + ["--model", "LightGCN", "--workdir", str(tmp_path)]
    )
    assert all(np.isfinite(v) for v in metrics.values())


def test_find_lambda_sweep(tmp_path):
    df = find_lambda_cli.main(
        SMALL
        + ["--model", "SpreadLightGCNOpti", "--workdir", str(tmp_path), "--step", "0.5"]
    )
    assert list(df["lambda"]) == [0.0, 0.5, 1.0]
    assert (tmp_path / "synthetic" / "evaluation" / "lambda_evaluation_10.csv").exists()


def test_evaluate_report(tmp_path, monkeypatch):
    # Pin the built-in OOXML fallback writer regardless of whether openpyxl
    # is installed: the inlineStr/single-part assertions below only hold for
    # it, and the fallback must stay exercised either way.
    import pandas as pd

    def _no_excel(*args, **kwargs):
        raise ImportError("forced fallback to the built-in xlsx writer")

    monkeypatch.setattr(pd, "ExcelWriter", _no_excel)

    # produce cached recommendations for two models at k=10, then report
    for model in ("HybridS", "HeatS"):
        main_cli.main(SMALL + ["--model", model, "--workdir", str(tmp_path)])
    sheets = evaluate_cli.main(
        SMALL
        + ["--model", "HybridS", "--workdir", str(tmp_path), "--ks", "10",
           "--models", "HybridS", "HeatS", "ProbS"]
    )
    assert 10 in sheets
    assert set(sheets[10]["Model"]) == {"HybridS", "HeatS"}

    # the Excel workbook is written even without openpyxl (built-in OOXML
    # writer); verify the zip structure and cell contents with stdlib tools
    import glob
    import xml.etree.ElementTree as ET
    import zipfile

    [xlsx] = glob.glob(str(tmp_path / "**" / "model_evaluation_results.xlsx"),
                       recursive=True)
    ns = "{http://schemas.openxmlformats.org/spreadsheetml/2006/main}"
    with zipfile.ZipFile(xlsx) as zf:
        wb = ET.fromstring(zf.read("xl/workbook.xml"))
        names = [s.attrib["name"] for s in wb.iter(f"{ns}sheet")]
        assert names == ["10"]
        sheet = ET.fromstring(zf.read("xl/worksheets/sheet1.xml"))
        rows = list(sheet.iter(f"{ns}row"))
        assert len(rows) == 3  # header + 2 models
        header = [c.find(f"{ns}is/{ns}t").text for c in rows[0].iter(f"{ns}c")]
        assert header[0] == "Model"
        assert {"P", "R", "F1", "NDCG", "H", "I"} <= set(header)
        first_model = rows[1].find(f"{ns}c").find(f"{ns}is/{ns}t").text
        assert first_model in {"HybridS", "HeatS"}
        # numeric cells round-trip as floats
        vals = [float(v.text) for v in rows[1].iter(f"{ns}v")]
        assert len(vals) == len(header) - 1


def test_xlsx_nonfinite_cells_are_inline_strings(tmp_path):
    """NaN/inf must not be written as OOXML numeric <v> cells (parsers
    reject <v>nan</v>); they fall back to inline strings."""
    import xml.etree.ElementTree as ET
    import zipfile

    from lgcnhs_tpu.runtime.xlsx import write_xlsx

    path = str(tmp_path / "t.xlsx")
    write_xlsx(path, {"s": [["a", 1.5, float("nan"), float("inf"), 2]]})
    ns = "{http://schemas.openxmlformats.org/spreadsheetml/2006/main}"
    with zipfile.ZipFile(path) as zf:
        sheet = ET.fromstring(zf.read("xl/worksheets/sheet1.xml"))
    cells = list(sheet.iter(f"{ns}c"))
    kinds = [c.get("t") for c in cells]
    assert kinds == ["inlineStr", None, "inlineStr", "inlineStr", None]
    numeric = [c.find(f"{ns}v").text for c in cells if c.get("t") is None]
    assert [float(v) for v in numeric] == [1.5, 2.0]


def test_main_target_user_raw_id_decode(tmp_path):
    """--target-user takes a RAW dataset id routed through data/idmap.IdMapper
    (the reference's target_user is a raw md5, const.py:244): the log line
    carries both the raw and internal ids plus the raw-decoded item list."""
    import logging

    messages = []

    class _Capture(logging.Handler):
        def emit(self, record):
            messages.append(record.getMessage())

    handler = _Capture()  # the lgcnhs logger has propagate=False; attach
    logging.getLogger("lgcnhs").addHandler(handler)
    try:
        main_cli.main(
            SMALL + ["--model", "HybridS", "--workdir", str(tmp_path),
                     "--target-user", "3"]  # raw 1-based ml-100k-style id
        )
        lines = [m for m in messages if "recommendations for user" in m]
        assert lines, "target-user line not logged"
        assert "user 3 (internal" in lines[0]

        # unknown raw id warns instead of crashing or mis-indexing
        messages.clear()
        main_cli.main(
            SMALL + ["--model", "HybridS", "--workdir", str(tmp_path),
                     "--target-user", "no-such-md5"]
        )
        assert any("not found in the id mapping" in m for m in messages)
    finally:
        logging.getLogger("lgcnhs").removeHandler(handler)


def test_main_target_user_without_cached_mappings(tmp_path, monkeypatch):
    """Warm split caches written without id_mappings.npz yield empty mapping
    dicts: --target-user-internal must still print (internal ids only) and
    --target-user must warn — neither may crash (round-4 review finding)."""
    import dataclasses
    import logging

    import lgcnhs_tpu.cli.main as main_mod

    real = main_mod.load_pipeline

    def patched(cfg):
        graph, uf, itf, splits = real(cfg)
        return graph, uf, itf, dataclasses.replace(
            splits, uid_mapping={}, iid_mapping={}
        )

    monkeypatch.setattr(main_mod, "load_pipeline", patched)
    messages = []

    class _Capture(logging.Handler):
        def emit(self, record):
            messages.append(record.getMessage())

    handler = _Capture()
    logging.getLogger("lgcnhs").addHandler(handler)
    try:
        m = main_cli.main(
            SMALL + ["--model", "HybridS", "--workdir", str(tmp_path),
                     "--target-user-internal", "3"]
        )
        assert all(np.isfinite(v) for v in m.values())
        assert any("recommendations for internal user 3" in s for s in messages)

        messages.clear()
        m = main_cli.main(
            SMALL + ["--model", "HybridS", "--workdir", str(tmp_path),
                     "--target-user", "3"]
        )
        assert all(np.isfinite(v) for v in m.values())
        assert any("no id mappings cached" in s for s in messages)
    finally:
        logging.getLogger("lgcnhs").removeHandler(handler)


def test_main_douban_from_raw_csvs(tmp_path):
    """Full real-data Douban path through the CLI: --data-dir resolves the
    reference's users/movies/ratings CSV names (const.py:225-227 via
    data/fetch.douban_paths), prepare_douban runs the cleaning-map feature
    pipeline, LightGCNOpti consumes the features, and the HeatS-on-Douban
    quirk dispatch serves — previously --data-dir silently mapped douban to
    ml-100k file names and fell back to synthetic."""
    from tests.test_ingestion import _write_douban

    data_dir = tmp_path / "douban"
    data_dir.mkdir()
    _write_douban(data_dir)
    metrics = main_cli.main(
        [
            "--dataset", "douban", "--env", "dev", "--data-dir", str(data_dir),
            "--model", "SpreadLightGCNOpti", "--workdir", str(tmp_path / "wd"),
            "--epochs", "6", "--quantile", "1", "0",  # 15-user fixture: no band filter
        ]
    )
    assert set(metrics) == {"P", "R", "F1", "NDCG", "H", "I"}
    assert all(np.isfinite(v) for v in metrics.values())
    # the douban feature pipeline (not the synthetic fallback) produced the
    # preprocessing artifacts
    feats = os.path.join(str(tmp_path / "wd"), "douban", "preprocess",
                         "item_features.csv")
    assert os.path.exists(feats)
    # reference-format tab-separated CSV with a list-valued column
    # (handleMovielens.py:190-195): row 2's list length is the feature width
    row = open(feats).readlines()[1].split("\t")[1]
    width = row.count(",") + 1
    # fixture's observed-vocab widths (MultiLabelBinarizer semantics): 3
    # title + 3 cleaned genres + 2 language codes + 6 duration + 20
    # storyline + 2 region codes + 6 year — NOT the synthetic fallback's 37
    assert width == 3 + 3 + 2 + 6 + 20 + 2 + 6
