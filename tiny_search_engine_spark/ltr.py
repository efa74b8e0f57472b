"""D12: learning-to-rank rerank layer (SURVEY.md §2 D12).

The reference has an optional xgboost rerank compiled out by default
(``#ifdef XGBOOST``, /root/reference/include/common.h:17): features are
densified through the ``conf/feature.conf`` name→id map and scored with
``XGBoosterPredict``; ``final_score`` becomes the model prediction
(/root/reference/src/xgboost_mgr.cpp:52-188, table.cpp:669-685).

Spark re-expression: the model is a broadcast variable; scoring is one
Arrow-batched pandas UDF over a ``map<string,double>`` features column —
executor-parallel batch predict instead of the reference's per-result
loop. xgboost itself is import-gated (absent in this sandbox); a
deterministic ``LinearModel`` implements the same interface so the
plumbing — feature densification order, missing-feature default, batch
shape — is real and tested either way.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# /root/reference/conf/feature.conf:1-50 — id→name, '#' lines are
# features excluded from the model input (xgboost_mgr.cpp loads only
# uncommented entries). Vector length = max id + 1; absent ids stay 0.0
# like the reference's zero-initialised DMatrix row.
REFERENCE_FEATURE_CONF = """\
37\tF_Q_LEN
7\tF_Q_TERM_CNT
30\tF_U_LEN
25\tF_U_TERM_CNT
5\tF_QU_STR_LEN_CQR
33\tF_QU_STR_LEN_CTR
14\tF_QU_STR_LEN_COVERAGE
27\tF_QU_TERM_WEI_CQR
6\tF_QU_TERM_WEI_CTR
32\tF_QU_TERM_WEI_COVERAGE
15\tF_QU_TERM_CNT_CQR
8\tF_QU_TERM_CNT_CTR
13\tF_QU_TERM_CNT_COVERAGE
22\tF_QU_TERM_LCSTR_OVER_Q
19\tF_QU_TERM_LCSTR_OVER_U
34\tF_QU_TERM_LCSEQ_OVER_Q
31\tF_QU_TERM_LCSEQ_OVER_U
16\tF_QU_TERM_EDIST_OVER_Q
21\tF_QU_TERM_EDIST_OVER_U
20\tF_QU_STR_LCSTR_OVER_Q
24\tF_QU_STR_LCSTR_OVER_U
35\tF_QU_STR_LCSEQ_OVER_Q
29\tF_QU_STR_LCSEQ_OVER_U
1\tF_QU_STR_EDIST_OVER_Q
3\tF_QU_STR_EDIST_OVER_U
17\tF_QU_EXTRA
10\tF_QU_MISS
2\tF_QU_DISORDER
18\tF_QU_PROXIMITY
28\tF_QU_VSM
4\tF_QU_BM25
12\tF_QU_OFF_DIST
"""


def load_feature_conf(text: str = REFERENCE_FEATURE_CONF) -> dict[str, int]:
    """``id<TAB>name`` lines → {name: id}; '#'-prefixed and blank lines are
    skipped (the reference's conf parser semantics)."""
    out: dict[str, int] = {}
    for line in text.splitlines():
        line = line.strip()
        if not line or line.startswith("#"):
            continue
        fid, name = line.split(None, 1)
        out[name.strip()] = int(fid)
    return out


def featurize(feature_map: dict[str, float], ids: dict[str, int]) -> np.ndarray:
    """One dense row in feature-id order (missing features → 0.0)."""
    n = max(ids.values()) + 1 if ids else 0
    row = np.zeros(n, dtype=np.float64)
    for name, fid in ids.items():
        v = feature_map.get(name)
        if v is not None:
            row[fid] = float(v)
    return row


@dataclass(frozen=True)
class LinearModel:
    """Deterministic stand-in with the booster's predict interface:
    ``predict(X[n, d]) -> scores[n]``."""

    weights: np.ndarray  # shape (d,)
    bias: float = 0.0

    def predict(self, X: np.ndarray) -> np.ndarray:
        return X @ self.weights[: X.shape[1]] + self.bias


def try_load_xgboost(model_path: str):
    """Load a real booster when the xgboost package is present (it is not
    in this sandbox — callers fall back to LinearModel or skip rerank,
    like the reference's compiled-out default)."""
    try:
        import xgboost  # noqa: PLC0415
    except ImportError as e:  # pragma: no cover - library absent here
        raise ImportError(
            "xgboost is not installed; D12 rerank runs with LinearModel "
            "or stays disabled (the reference ships the same way: "
            "#ifdef XGBOOST is off by default)"
        ) from e
    booster = xgboost.Booster()
    booster.load_model(model_path)

    class _B:
        def predict(self, X):
            return booster.inplace_predict(X)

    return _B()  # pragma: no cover


def rerank(
    df: DataFrame,
    model,
    ids: dict[str, int] | None = None,
    features_col: str = "features",
    k: int | None = None,
) -> DataFrame:
    """``final_score = model(features)`` + per-query re-sort (+ optional
    top-k), the reference's rank path with the model enabled
    (table.cpp:669-691). *df* needs (query_id, doc_id, features_col:
    map<string,double>); the model and id map ship as task-broadcast
    closure state, predictions run batch-per-Arrow-chunk."""
    ids = ids or load_feature_conf()
    n = max(ids.values()) + 1 if ids else 0
    names = list(ids.keys())
    fids = np.array([ids[nm] for nm in names], dtype=np.int64)

    @F.pandas_udf(T.DoubleType())
    def score_udf(feats: pd.Series) -> pd.Series:
        X = np.zeros((len(feats), n), dtype=np.float64)
        for i, fm in enumerate(feats):
            if fm is None:
                continue
            for nm, fid in zip(names, fids):
                v = fm.get(nm)
                if v is not None:
                    X[i, fid] = v
        return pd.Series(model.predict(X))

    from pyspark.sql import Window

    out = df.withColumn("final_score", score_udf(F.col(features_col)))
    w = Window.partitionBy("query_id").orderBy(F.desc("final_score"), F.asc("doc_id"))
    out = out.withColumn("rank", F.row_number().over(w))
    if k is not None:
        out = out.filter(F.col("rank") <= k)
    return out
