"""Extraction-config sweep (grid search).

The reference's preprocessing/psm grid search
(/root/reference/Image_Preprocessing_Optimization/ImageGridSearch.py:20-137
+ CustomFunctions.py:40-79): OCR the corpus under each candidate config,
score each prediction against ground truth with ``zero_one_loss``, rank the
configs.  Re-expressed Ray-Data-first:

* ONE streaming pass over the pages — an actor-pool stage holds one warm
  engine per config (configs are few) and extracts every page under every
  candidate, emitting tiny integer ``(config, hits, expected, conf_total,
  blocks)`` rows; the html payload never fans out per config and never
  re-enters the object store.
* per-batch partial aggregation → a ``groupby(config)`` over ≤ |configs|
  tiny rows per batch — the only shuffle moves a handful of integers.

Scoring is micro-averaged with EXACT integer sums (partial-sum order can
never change the result, so the sweep is bit-reproducible and
SQL-oracle-able): ``hit_rate = Σhits/Σexpected`` is the corpus-level
zero_one_loss (the reference's "loss" is really accuracy,
CustomFunctions.py:74-79 — HIGHER is better), ``mean_conf =
Σconf/Σblocks`` breaks ties (the synthetic engine models config quality as
confidence adjustments, raster.py:127-131, so sweeps stay meaningful
without a real Tesseract).
"""

from __future__ import annotations

import pyarrow as pa

from ..functions.document import PRESETS, ExtractConfig, extract_document
from ..functions.raster import make_engine
from ..functions.textfns import zero_one_hits


def default_grid() -> dict[str, ExtractConfig]:
    """psm × preprocessing grid (the reference's sweep axes) + GUI presets."""
    grid = {
        f"psm{p}_pre{int(pre)}": ExtractConfig(psm=p, preprocessing=pre)
        for p in (3, 6, 11)
        for pre in (False, True)
    }
    grid.update(PRESETS)
    return grid


class _SweepScore:
    """Actor-pool stage: page rows → (config, hits, expected, conf_total,
    blocks) integer rows.

    Ground truth is broadcast once via ``ray.put``; one warm engine per
    config is built per actor (the reference rebuilds its pipeline per
    image — here setup is paid once, work per batch)."""

    def __init__(self, configs: dict[str, ExtractConfig], truth_ref, tol):
        import ray

        self.truth: dict[str, list[str]] = ray.get(truth_ref)
        self.configs = configs
        self.engines = {n: make_engine(c.engine) for n, c in configs.items()}
        self.tol = tol

    def __call__(self, batch: pa.Table) -> pa.Table:
        names, hits, exp_n, conf_tot, blocks = [], [], [], [], []
        for url, html in zip(
            batch.column("url").to_pylist(), batch.column("html").to_pylist()
        ):
            exp = self.truth.get(url)
            if exp is None:
                continue
            for name, cfg in self.configs.items():
                doc = extract_document(url, bytes(html), cfg, self.engines[name])
                pred = [b["text"] for p in doc["pages"] for b in p["blocks"]]
                names.append(name)
                hits.append(zero_one_hits(exp, pred, self.tol))
                exp_n.append(len(exp))
                conf_tot.append(round(doc["mean_conf"] * doc["n_blocks"]))
                blocks.append(doc["n_blocks"])
        return pa.table(
            {
                "config": pa.array(names, pa.string()),
                "hits": pa.array(hits, pa.int64()),
                "expected": pa.array(exp_n, pa.int64()),
                "conf_total": pa.array(conf_tot, pa.int64()),
                "blocks": pa.array(blocks, pa.int64()),
            }
        )


def config_sweep(
    input_path,
    truth: dict[str, list[str]],
    configs: dict[str, ExtractConfig] | None = None,
    tol: int | float = 0.2,
    concurrency=(1, 8),
    batch_size: int = 32,
) -> pa.Table:
    """Sweep configs over a labeled corpus → one row per config, best first
    (hit_rate desc, mean_conf desc, name asc).  ``input_path`` may be a
    pages parquet path/dir or an existing pages Dataset."""
    import ray
    from ray.data.aggregate import Sum

    from ..sources.pages import read_pages

    configs = configs or default_grid()
    ds = input_path if hasattr(input_path, "map_batches") else read_pages(input_path)
    truth_ref = ray.put(truth)
    scored = ds.map_batches(
        _SweepScore,
        fn_constructor_kwargs={
            "configs": configs,
            "truth_ref": truth_ref,
            "tol": tol,
        },
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
        num_cpus=1,
    )

    def partial(b: pa.Table) -> pa.Table:
        g = b.group_by("config").aggregate(
            [("hits", "sum"), ("expected", "sum"),
             ("conf_total", "sum"), ("blocks", "sum")]
        )
        return g.rename_columns(
            [n[:-4] if n.endswith("_sum") else n for n in g.column_names]
        )

    agg = (
        scored.map_batches(partial, batch_format="pyarrow")
        .groupby("config")
        .aggregate(
            Sum("hits", alias_name="hits"),
            Sum("expected", alias_name="expected"),
            Sum("conf_total", alias_name="conf_total"),
            Sum("blocks", alias_name="blocks"),
        )
    ).to_pandas()
    agg["hit_rate"] = agg["hits"] / agg["expected"]
    agg["mean_conf"] = agg["conf_total"] / agg["blocks"]
    agg = agg.sort_values(
        ["hit_rate", "mean_conf", "config"], ascending=[False, False, True]
    ).reset_index(drop=True)
    return pa.Table.from_pandas(
        agg[["config", "hit_rate", "mean_conf", "hits", "expected", "blocks"]],
        preserve_index=False,
    )
