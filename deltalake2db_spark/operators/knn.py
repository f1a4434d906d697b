"""k-NN label propagation over an embedding column.

The semi-supervised step of modern data curation (DCLM / FineWeb-Edu
style): a small human- or LLM-labeled SEED SET assigns a quality/topic
label to every corpus document by majority vote among its k nearest
neighbors in embedding space.

Model definition (deterministic, engine-exact):

* similarity  = cosine, ROUNDED to 4 decimals before ranking (raw
  doubles differ in the last ulp between engines/summation orders)
* neighbors(x) = top-k labeled rows by (sim DESC, seed id ASC)
* pred(x)      = the label with the most neighbors; ties break by
  label ASC.  ``n_votes`` = that label's neighbor count.

Spark-first design
------------------
The seed set is MODEL-SIZED by construction (it was labeled by hand or
by an expensive model), so it localizes to the driver once and folds
into a single ``mapInPandas`` stage: one numpy GEMM per Arrow batch
against the normalized seed matrix, top-k + vote inside the kernel —
the corpus NEVER shuffles and nothing returns to the driver
(``kmeans_assign``'s broadcast-centroid shape, with a vote instead of
an argmin).  Seed-set ceiling: S x dim x 8 B in the task closure —
same envelope as ``similarity.brute_force_topk``'s query bound.

Reference scope note: the reference engine (bmsuisse/deltalake2db) has
no vector operators (SURVEY.md §2.5); this is a north-star extension
for LLM training-data pipelines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def knn_classify(
    items: DataFrame,
    labeled: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
) -> DataFrame:
    """``(id_col, pred_label, n_votes)`` — majority label among the k
    cosine-nearest seed rows, for every row of ``items``.

    ``labeled`` must be model-sized (driver-localized); zero-norm or
    NULL embeddings on either side are dropped (cosine undefined).
    """
    import numpy as np

    from pyspark.sql.types import IntegerType, StructField, StructType

    seeds = (
        labeled.filter(
            labeled[label_col].isNotNull() & labeled[vec_col].isNotNull()
        )
        .select(id_col, vec_col, label_col)
        .collect()
    )
    sid = np.array([r[0] for r in seeds])  # int or string ids both sort
    smat = np.array([np.asarray(r[1], dtype=np.float64) for r in seeds])
    slab = np.array([r[2] for r in seeds])
    norms = np.sqrt((smat * smat).sum(axis=1))
    ok = norms > 0
    sid, smat, slab, norms = sid[ok], smat[ok], slab[ok], norms[ok]
    smat = smat / norms[:, None]
    # seed order by id so per-row argsort tie-breaks on seed id ASC
    order = np.argsort(sid, kind="stable")
    sid, smat, slab = sid[order], smat[order], slab[order]
    kk = min(k, len(sid))

    label_field = labeled.schema[label_col]
    schema = StructType(
        [
            items.schema[id_col],
            StructField("pred_label", label_field.dataType),
            StructField("n_votes", IntegerType()),
        ]
    )

    def classify(batches):
        import pandas as pd

        for pdf in batches:
            vecs = pdf[vec_col]
            keep, X = [], []
            for i, v in enumerate(vecs):
                if v is None:
                    continue
                a = np.asarray(v, dtype=np.float64)
                n = np.sqrt((a * a).sum())
                if n > 0:
                    keep.append(i)
                    X.append(a / n)
            if not keep:
                # empty frame with the input id dtype preserved
                yield pd.DataFrame(
                    {
                        id_col: pdf[id_col].iloc[:0],
                        "pred_label": pd.Series([], dtype=object),
                        "n_votes": pd.Series([], dtype="int32"),
                    }
                )
                continue
            X = np.array(X)
            sims = np.round(X @ smat.T, 4)
            # top-k by (sim DESC, seed id ASC): seeds are id-sorted, so
            # a stable sort on -sim preserves the id tie-break
            nb = np.argsort(-sims, axis=1, kind="stable")[:, :kk]
            preds, votes = [], []
            for row in nb:
                labs, counts = np.unique(slab[row], return_counts=True)
                # np.unique returns labels ASC — argmax takes the first
                # (lowest) label on count ties
                j = int(np.argmax(counts))
                preds.append(labs[j])
                votes.append(int(counts[j]))
            ids = pdf[id_col].iloc[keep].to_numpy()
            yield pd.DataFrame(
                {
                    id_col: ids,
                    "pred_label": preds,
                    "n_votes": np.asarray(votes, dtype="int32"),
                }
            )

    return items.select(id_col, vec_col).mapInPandas(classify, schema)
