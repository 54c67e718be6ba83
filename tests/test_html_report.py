"""Static HTML run report (training/html_report.py) — the self-contained
equivalent of the reference's wandb dashboards + the vendored dominate
HTML pages (robonet/robonet/video_prediction/utils/html.py)."""

import json
import os

import numpy as np

from robot_aware_control_tpu.training.html_report import (
    build_report,
    parse_metrics,
    svg_line_chart,
)


def _write_jsonl(path, rows):
    with open(path, "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")


def _fake_run(tmp_path, n_steps=30):
    run = tmp_path / "run"
    run.mkdir()
    rng = np.random.RandomState(0)
    rows = []
    for s in range(n_steps):
        rows.append({"train/loss": float(np.exp(-s / 10) + 0.01 * rng.rand()),
                     "step": s, "wall_s": s * 2.0})
        if s % 10 == 0:
            rows.append({"eval/autoreg_psnr": 20.0 + s / 5,
                         "eval/autoreg_ssim": 0.8 + s / 1000, "step": s})
            gif = run / f"eval_{s}.gif"
            gif.write_bytes(b"GIF89a fake")
            rows.append({"eval_video": gif.name, "step": s})
    # media referenced in the jsonl that was never written to disk
    rows.append({"eval_video": "ghost.gif", "step": 99})
    _write_jsonl(run / "metrics.jsonl", rows)
    # an unreferenced strip the trainer saved directly
    (run / "strip_final.png").write_bytes(b"\x89PNG fake")
    return run


def test_parse_metrics_splits_scalars_and_media(tmp_path):
    run = _fake_run(tmp_path)
    series, media = parse_metrics(str(run / "metrics.jsonl"))
    assert len(series["train/loss"]) == 30
    assert series["train/loss"][0][0] == 0.0
    assert [m[0] for m in media] == ["eval_video"] * 4
    # wall_s is a scalar series too, never media
    assert "wall_s" in series


def test_build_report_contains_charts_tiles_table_media(tmp_path):
    run = _fake_run(tmp_path)
    out = build_report(str(run))
    assert os.path.basename(out) == "report.html"
    html = open(out).read()
    # one polyline chart per multi-point metric
    assert html.count("<polyline") == len(
        [k for k, v in parse_metrics(str(run / "metrics.jsonl"))[0].items()
         if len(v) >= 2])
    # headline tiles, hover tooltips, table view, media captions
    assert "eval/autoreg_psnr" in html and "class='tile'" in html
    assert "<title>step" in html
    assert "table view" in html
    assert "eval_0.gif" in html and "strip_final.png" in html
    # media the jsonl references but that doesn't exist is skipped
    assert "ghost.gif" not in html


def test_nonfinite_metrics_never_blank_a_chart(tmp_path):
    """A diverged run's NaN/inf rows must not poison min/max scaling into
    'nan' SVG coordinates (the run where the chart matters most)."""
    run = tmp_path / "r"
    run.mkdir()
    _write_jsonl(run / "metrics.jsonl", [
        {"train/loss": 1.0, "step": 0},
        {"train/loss": float("nan"), "step": 1},
        {"train/loss": float("inf"), "step": 2},
        {"train/loss": 0.5, "step": 3},
    ])
    series, _ = parse_metrics(str(run / "metrics.jsonl"))
    assert [v for _, v in series["train/loss"]] == [1.0, 0.5]
    html = open(build_report(str(run))).read()
    assert "<polyline" in html and "nan" not in html.split("<svg", 1)[1]


def test_cwd_relative_media_paths_resolve(tmp_path, monkeypatch):
    """Relative cfg.log_dir makes the trainer log CWD-relative media paths
    like runs/job/eval.gif; the gallery must still find them."""
    monkeypatch.chdir(tmp_path)
    run = tmp_path / "runs" / "job"
    run.mkdir(parents=True)
    sub = run / "plots"
    sub.mkdir()
    (sub / "deep.gif").write_bytes(b"GIF89a fake")
    _write_jsonl(run / "metrics.jsonl", [
        {"train/loss": 1.0, "step": 0},
        {"eval_video": "runs/job/plots/deep.gif", "step": 0},
    ])
    html = open(build_report("runs/job")).read()
    assert "plots/deep.gif" in html


def test_chart_handles_flat_and_tiny_series():
    svg = svg_line_chart("k", [(0, 1.0), (1, 1.0), (2, 1.0)])
    assert "<polyline" in svg and "NaN" not in svg
    svg = svg_line_chart("k", [(0, 5.0), (1000000, -5.0)])
    assert "step 1e+06" in svg or "step 1000000" in svg


def test_chart_downsamples_long_series():
    pts = [(float(i), float(i % 7)) for i in range(5000)]
    svg = svg_line_chart("k", pts)
    assert svg.count("<circle") <= 241
    # the last point always survives downsampling
    assert "step 4999" in svg


def test_html_is_escaped(tmp_path):
    run = tmp_path / "r<script>"
    run.mkdir()
    _write_jsonl(run / "metrics.jsonl",
                 [{"a<b": 1.0, "step": 0}, {"a<b": 2.0, "step": 1}])
    html = open(build_report(str(run))).read()
    assert "a&lt;b" in html and "<script>" not in html


def test_run_logger_close_builds_report(tmp_path):
    from robot_aware_control_tpu.config import Config
    from robot_aware_control_tpu.training.logger import RunLogger

    cfg = Config(log_dir=str(tmp_path), jobname="repjob", wandb=False)
    lg = RunLogger(cfg)
    lg.scalars({"loss": 1.0}, 0, prefix="train/")
    lg.scalars({"loss": 0.5}, 1, prefix="train/")
    lg.close()
    assert os.path.isfile(os.path.join(str(tmp_path), "repjob", "report.html"))
