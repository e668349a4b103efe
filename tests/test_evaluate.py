"""Aggregation + metrics tests: weighted scores, per-road class decision,
TP/FP/FN tagging with the wrong-class double-count rule, threshold sweeps,
baselines, and chart output."""

import numpy as np
import pandas as pd
import pytest

from roadsurf_tpu.geom.core import Polygon
from roadsurf_tpu.geom.table import GeoDataFrame
from roadsurf_tpu.pipeline.classify import (determine_detected_class,
                                            get_corresponding_class,
                                            get_roads_in_quarries,
                                            get_weighted_scores)
from roadsurf_tpu.pipeline.evaluate import (baseline_comparison, get_metrics,
                                            get_tag, sweep_score_threshold,
                                            tag_rows)


def _rect(x0, y0, x1, y1):
    return Polygon([(x0, y0), (x1, y0), (x1, y1), (x0, y1)])


LABELS_ID = pd.DataFrame({"id": [1, 2],
                          "name": ["artificial", "natural"],
                          "supercategory": ["road", "road"]})


def test_get_corresponding_class():
    assert get_corresponding_class(0, LABELS_ID) == "artificial"
    assert get_corresponding_class(1, LABELS_ID) == "natural"


def test_get_tag_rules():
    assert get_tag("undetected", "artificial") == "FN"
    assert get_tag("undetermined", "natural") == "FN"
    assert get_tag("artificial", "artificial") == "TP"
    assert get_tag("artificial", "natural") == "wrong class"


def test_get_roads_in_quarries():
    roads = GeoDataFrame({
        "OBJECTID": [1, 2],
        "geometry": [_rect(0, 0, 10, 10), _rect(100, 100, 110, 110)],
    }, crs="EPSG:2056")
    quarries = GeoDataFrame({"geometry": [_rect(-10, -10, 20, 20)]},
                            crs="EPSG:2056")
    inq, notq = get_roads_in_quarries(quarries, roads)
    assert list(inq["OBJECTID"]) == [1]
    assert list(notq["OBJECTID"]) == [2]


def test_get_weighted_scores():
    gt = GeoDataFrame({
        "OBJECTID": [1],
        "BELAGSART": [100],
        "geometry": [_rect(0, 0, 10, 10)],   # area 100
    }, crs="EPSG:2056")
    preds = GeoDataFrame({
        "score": [0.8, 0.6],
        "det_class_name": ["artificial", "natural"],
        # pred 1 covers half the label, pred 2 covers 1%-> dropped (<=0.05)
        "geometry": [_rect(0, 0, 5, 10), _rect(9, 9, 10, 10)],
    }, crs="EPSG:2056")
    out = get_weighted_scores(gt, preds)
    assert len(out) == 1
    assert out["area_pred_in_label"].iloc[0] == pytest.approx(0.5)
    assert out["weighted_score"].iloc[0] == pytest.approx(0.4)


def test_determine_detected_class_decision():
    roads = GeoDataFrame({
        "OBJECTID": [1, 2, 3],
        "CATEGORY": ["artificial", "natural", "artificial"],
        "gt_type": ["gt", "gt", "gt"],
        "geometry": [_rect(0, 0, 10, 10), _rect(20, 0, 30, 10),
                     _rect(40, 0, 50, 10)],
    }, crs="EPSG:2056")
    preds = pd.DataFrame({
        "OBJECTID": [1, 1, 2],
        "det_class_name": ["artificial", "natural", "natural"],
        "weighted_score": [0.45, 0.1, 0.3],
        "area_pred_in_label": [0.5, 0.5, 0.5],
        "score": [0.9, 0.2, 0.6],
    })
    out = determine_detected_class(preds, roads, threshold=0.0)
    out = out.set_index("road_id")
    # road 1: art index 0.9 vs nat 0.2 -> artificial, diff 0.7
    assert out.loc[1, "cover_type"] == "artificial"
    assert out.loc[1, "art_score"] == pytest.approx(0.9)
    assert out.loc[1, "diff_score"] == pytest.approx(0.7)
    # road 2: only natural
    assert out.loc[2, "cover_type"] == "natural"
    # road 3: no detections
    assert out.loc[3, "cover_type"] == "undetected"
    # threshold removes the low-score natural detection on road 2
    out_thr = determine_detected_class(preds, roads, threshold=0.7)
    out_thr = out_thr.set_index("road_id")
    assert out_thr.loc[2, "cover_type"] == "undetected"


def test_get_metrics_wrong_class_double_count():
    comp = pd.DataFrame({
        "CATEGORY": ["artificial", "artificial", "natural", "natural",
                     "natural"],
        "cover_type": ["artificial", "natural", "natural", "undetected",
                       "artificial"],
    })
    comp["tag"] = tag_rows(comp)
    bc, gm = get_metrics(comp, ["artificial", "natural"])
    bc = bc.set_index("cover_class")
    # artificial: TP=1; FP= natural GT predicted artificial =1;
    #             FN = artificial GT predicted natural =1
    assert bc.loc["artificial", "TP"] == 1
    assert bc.loc["artificial", "FP"] == 1
    assert bc.loc["artificial", "FN"] == 1
    # natural: TP=1, FP=1 (art GT predicted nat), FN=2 (undetected + wrong)
    assert bc.loc["natural", "TP"] == 1
    assert bc.loc["natural", "FP"] == 1
    assert bc.loc["natural", "FN"] == 2
    assert gm["Pb"].iloc[0] == pytest.approx((0.5 + 0.5) / 2)
    assert gm["Rb"].iloc[0] == pytest.approx((0.5 + 1 / 3) / 2)


def test_sweep_picks_best_threshold():
    roads = GeoDataFrame({
        "OBJECTID": [1, 2],
        "CATEGORY": ["artificial", "natural"],
        "gt_type": ["gt", "gt"],
        "geometry": [_rect(0, 0, 10, 10), _rect(20, 0, 30, 10)],
    }, crs="EPSG:2056")
    # a noisy low-score wrong detection on road 2 that a 0.5 threshold kills
    preds = pd.DataFrame({
        "OBJECTID": [1, 2, 2],
        "det_class_name": ["artificial", "artificial", "natural"],
        "weighted_score": [0.9, 0.35, 0.3],
        "area_pred_in_label": [1.0, 0.5, 0.5],
        "score": [0.9, 0.4, 0.6],
    })
    best_thr, all_bc, all_gm, best_bc, best_gm = sweep_score_threshold(
        preds, roads, ["artificial", "natural"])
    assert 0.4 < best_thr <= 0.6
    assert best_gm["f1b"].iloc[0] == pytest.approx(1.0)
    assert len(all_gm) == 20     # thresholds 0..0.95


def test_baselines():
    comp = pd.DataFrame({
        "CATEGORY": ["artificial"] * 6 + ["natural"] * 4,
        "cover_type": ["natural"] * 10,
        "gt_type": ["gt"] * 10,
    })
    bc, gm = baseline_comparison(comp, ["artificial", "natural"],
                                 "all artificial")
    bc = bc.set_index("cover_class")
    assert bc.loc["artificial", "TP"] == 6
    assert bc.loc["natural", "TP"] == 0
    bc2, gm2 = baseline_comparison(comp, ["artificial", "natural"], "random")
    assert (bc2["TP"].sum() + bc2["FP"].sum()) > 0


def test_figure_html(tmp_path):
    from roadsurf_tpu.viz import Figure
    f = Figure()
    f.add_scatter([0, 0.5, 1], [0.2, 0.9, 0.4], name="trace a",
                  text=["t0", "t1", "t2"])
    f.add_scatter([0, 1], [0, 1], name="ref", mode="lines")
    f.update_layout(xaxis_title="Recall", yaxis_title="Precision",
                    title="PR", xaxis={"range": [0, 1]},
                    yaxis={"range": [0, 1]})
    p = f.write_html(str(tmp_path / "c.html"))
    content = open(p).read()
    assert "<svg" in content and "trace a" in content and "Recall" in content
