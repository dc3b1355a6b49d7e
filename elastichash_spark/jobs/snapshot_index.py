"""spark-submit job #5: snapshot-repository operations (ES ``_snapshot`` API).

Usage:
    spark-submit --py-files elastichash_spark.zip \
        elastichash_spark/jobs/snapshot_index.py \
        snapshot --index /path/index --repo /path/repo --name nightly-01
    ... restore  --repo /path/repo --name nightly-01 --dest /path/new_index
    ... verify   --repo /path/repo --name nightly-01
    ... delete   --repo /path/repo --name nightly-01
    ... list     --repo /path/repo

Completes the operational lifecycle the other jobs cover (build / append /
compact / query): the repository itself is driver-side file plumbing
(``elastichash_spark/snapshot.py`` — content-addressed incremental blobs,
hash-verified restore), so no SparkSession is created; shipping it as a
--py-files job keeps ONE deploy artifact and one scheduler entry-point for
the whole index lifecycle. Runs identically under plain ``python``.
Prints one JSON line, like every other job.
"""

from __future__ import annotations

import argparse
import json
import time


def main() -> None:
    ap = argparse.ArgumentParser()
    sub = ap.add_subparsers(dest="cmd", required=True)

    s = sub.add_parser("snapshot", help="snapshot a finished index into a repo")
    s.add_argument("--index", required=True)
    s.add_argument("--repo", required=True)
    s.add_argument("--name", required=True)

    r = sub.add_parser("restore", help="materialize a snapshot as an index dir")
    r.add_argument("--repo", required=True)
    r.add_argument("--name", required=True)
    r.add_argument("--dest", required=True)

    v = sub.add_parser("verify", help="CheckIndex analogue: re-hash every blob")
    v.add_argument("--repo", required=True)
    v.add_argument("--name", required=True)

    d = sub.add_parser("delete", help="drop a snapshot and GC unreferenced blobs")
    d.add_argument("--repo", required=True)
    d.add_argument("--name", required=True)

    ls = sub.add_parser("list", help="list snapshots in a repo")
    ls.add_argument("--repo", required=True)

    args = ap.parse_args()
    from elastichash_spark import snapshot as snap

    t0 = time.time()
    if args.cmd == "snapshot":
        out = snap.snapshot_index(args.index, args.repo, args.name)
    elif args.cmd == "restore":
        out = snap.restore_index(args.repo, args.name, args.dest)
    elif args.cmd == "verify":
        problems = snap.verify_snapshot(args.repo, args.name)
        out = {"name": args.name, "ok": not problems, "problems": problems}
    elif args.cmd == "delete":
        out = snap.delete_snapshot(args.repo, args.name)
    else:
        out = {"snapshots": snap.list_snapshots(args.repo)}
    print(json.dumps({"job": f"snapshot_{args.cmd}",
                      "wall_sec": round(time.time() - t0, 3), **out}))


if __name__ == "__main__":
    main()
