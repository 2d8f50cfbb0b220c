"""Cluster job entrypoint for the flagship extraction (+ optional index).

The north-rule deployment surface: submit this script with `ray job submit`
against a running cluster; on a workstation it runs standalone against a
local Ray.

    ray job submit --working-dir . -- \
        python tools/submit_extract.py \
            --input /mnt/shared/crawl/pages_in/ --out /mnt/shared/corpus/extracted/ \
            --num-partitions 4096 --index

The script owns the Ray session (the library never calls ray.init); resume
is on by default, so re-submitting after a failure skips complete
partitions.  ``--out`` must be a shared POSIX path (NFS): partition
promotion uses os.replace rename semantics, which object-store URIs don't
support (see README 'Cluster submission').
"""

from __future__ import annotations

import argparse
import json
import sys


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--input", required=True, help="pages_in parquet path/dir")
    ap.add_argument("--out", required=True, help="output corpus dir")
    ap.add_argument("--num-partitions", type=int, default=64,
                    help="url-hash partition count (fixed for the corpus' "
                         "lifetime; size so one partition fits a worker)")
    ap.add_argument("--no-resume", action="store_true",
                    help="recompute every partition even if manifests exist")
    ap.add_argument("--dedup", choices=["post", "pre", "off"], default="post")
    ap.add_argument("--batch-size", type=int, default=128)
    ap.add_argument("--oem", type=int, default=3)
    ap.add_argument("--psm", type=int, default=3)
    ap.add_argument("--fast", action="store_true", help="fast OCR model")
    ap.add_argument("--preprocessing", action="store_true")
    ap.add_argument("--index", action="store_true",
                    help="build the inverted index after extraction")
    ap.add_argument("--append", action="store_true",
                    help="incremental append into an existing --out")
    args = ap.parse_args(argv)

    import ray

    if not ray.is_initialized():
        # under `ray job submit` RAY_ADDRESS points at the cluster;
        # standalone this starts a local Ray
        ray.init(ignore_reinit_error=True)

    from studiocr_ray.functions.document import ExtractConfig
    from studiocr_ray.pipelines.extract_pipeline import (
        append_extract,
        run_extract,
    )
    from studiocr_ray.pipelines.index_pipeline import run_index

    cfg = ExtractConfig(oem=args.oem, psm=args.psm, best=not args.fast,
                        preprocessing=args.preprocessing)
    dedup = {"post": "post", "pre": "pre", "off": False}[args.dedup]
    if args.append:
        summary = append_extract(
            args.input, args.out, cfg=cfg, dedup=dedup,
            batch_size=args.batch_size,
        )
    else:
        summary = run_extract(
            args.input, args.out, cfg=cfg,
            num_partitions=args.num_partitions,
            resume=not args.no_resume, dedup=dedup,
            batch_size=args.batch_size,
        )
    print(json.dumps({"extract": summary}))
    if args.index:
        if args.append:
            # incremental refresh: rebuild only the url shards the appended
            # partitions map to (falls back to a full build when no index
            # exists yet or the partition modulus doesn't shard-align)
            from studiocr_ray.pipelines.index_pipeline import update_index

            print(json.dumps(
                {"index": update_index(args.out, summary.get("parts", []))}
            ))
        else:
            print(json.dumps({"index": run_index(args.out)}))
    ray.shutdown()
    return 0


if __name__ == "__main__":
    sys.exit(main())
