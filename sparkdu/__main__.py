"""Unified CLI: `python -m sparkdu <command> ...` — the analogue of the
reference's task-runner entry points [U tasks/DU_Task --trn/--tst/--run].

Commands:
    extract    resumable wave-committed extraction run (jobs/extract_job)
    curate     full training-data curation pipeline (jobs/curate_job)
    fit        train + freeze classifier artifacts (jobs/fit_artifacts)
    snapshots  snapshot history / expiry / time-travel read (jobs/snapshot_tool)
    incremental appends-scan incremental extract + merge (jobs/incremental_job)

Each command forwards its remaining arguments to the job's own argparse;
`python -m sparkdu extract --help` shows the job's options. Under
spark-submit, pass this module file (spark-submit takes a primary resource
file, not -m):

    spark-submit --py-files dist/sparkdu.zip sparkdu/__main__.py extract ...

or call the job file directly as before — both paths share the same
main()s.
"""

from __future__ import annotations

import sys

_COMMANDS = {
    "extract": ("sparkdu.jobs.extract_job", "resumable extraction run"),
    "curate": ("sparkdu.jobs.curate_job", "training-data curation pipeline"),
    "fit": ("sparkdu.jobs.fit_artifacts", "train + freeze classifier artifacts"),
    "snapshots": ("sparkdu.jobs.snapshot_tool", "snapshot history / expiry / read"),
    "incremental": ("sparkdu.jobs.incremental_job",
                    "appends-scan incremental extract + merge"),
}


def main(argv=None) -> None:
    argv = sys.argv[1:] if argv is None else argv
    if not argv or argv[0] in ("-h", "--help"):
        print("usage: python -m sparkdu <command> [args...]\n\ncommands:")
        for name, (_, desc) in _COMMANDS.items():
            print(f"  {name:<8} {desc}")
        sys.exit(0 if argv else 2)
    cmd = argv[0]
    if cmd not in _COMMANDS:
        print(f"unknown command {cmd!r}; try: {' '.join(_COMMANDS)}", file=sys.stderr)
        sys.exit(2)
    import importlib

    mod = importlib.import_module(_COMMANDS[cmd][0])
    if cmd == "fit":
        mod.main()  # fit takes no args
    else:
        mod.main(argv[1:])


if __name__ == "__main__":
    main()
