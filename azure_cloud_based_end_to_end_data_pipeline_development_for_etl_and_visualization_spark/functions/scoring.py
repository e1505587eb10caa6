"""Model-scoring via Arrow-vectorized Pandas UDFs.

The engine keeps analytics JVM-side (tests/test_plans.py enforces it),
but model inference is the legitimate Python hot path: a trained
quality/toxicity/language model scoring every document. The pattern
(SURVEY.md section 2.8, SNIPPETS.md [1][2]): ``@pandas_udf`` so workers
receive Arrow column batches — numpy-vectorized math, no per-row Python —
and the model object is loaded once per executor (module-level / broadcast),
not per batch.

The "model" here is a deterministic logistic scorer over the engine's own
quality signals — a stand-in with the exact execution shape of a real
sklearn/onnx scorer (swap ``_score_batch`` for model.predict_proba).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.types import DoubleType

#: fixed "model" coefficients: intercept, alpha_ratio, stopword_ratio,
#: log1p(token_count) — as if fit offline and shipped with the job
_COEF = np.array([-1.5, 2.0, 3.0, 0.25])


def _score_batch(alpha: np.ndarray, stop: np.ndarray, ntok: np.ndarray) -> np.ndarray:
    z = (
        _COEF[0]
        + _COEF[1] * alpha
        + _COEF[2] * stop
        + _COEF[3] * np.log1p(ntok)
    )
    return 1.0 / (1.0 + np.exp(-z))


@F.pandas_udf(DoubleType())
def quality_model_score(
    alpha_ratio: pd.Series, stopword_ratio: pd.Series, n_tokens: pd.Series
) -> pd.Series:
    """Arrow-batched logistic quality score in [0, 1]."""
    return pd.Series(
        _score_batch(
            alpha_ratio.to_numpy(dtype=np.float64),
            stopword_ratio.fillna(0.0).to_numpy(dtype=np.float64),
            n_tokens.to_numpy(dtype=np.float64),
        )
    )


def score_documents(alpha: Column, stop: Column, ntok: Column) -> Column:
    return quality_model_score(alpha, stop, ntok)
