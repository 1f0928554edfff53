"""Run-artifact retention is enforced mechanically (VERDICT r3 next-round
item 7): every `runs/...` and `perf/...` path cited as evidence in the
committed docs must exist in the tree AND be git-tracked, so the round-3
log loss (four cited protocol logs wiped with the session-recycled working
tree, RESULTS.md retention note) cannot recur silently.

Paths cited inside the retention note itself document the LOSS and are
exempt via an explicit allowlist — keep it short and dated.
"""

import os
import re
import subprocess

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# Paths that docs cite as *lost* (the round-3 retention note) — documented
# casualties, not dangling evidence.  Do not add to this list to silence a
# failure: commit the artifact instead (git add -f runs/<path>).
KNOWN_LOST = {
    "runs/protocol_r3_hard.log",
    "runs/protocol_r3_hard_nc.log",
    "runs/protocol_r3_latent_nc.log",
    "runs/protocol_r3_latent_gen.log",
    # glob-ish citation in the note ("protocol_r3_latent_gen*.jsonl")
    "runs/protocol_r3_latent_gen",
}

DOCS = ["RESULTS.md", "COVERAGE.md", "PARITY.md", "README.md", "MIGRATION.md"]

# `runs/...` or `perf/...` up to whitespace/punctuation that ends a citation;
# trailing `*` glob markers are trimmed before checking.  Checkpoint blobs
# (.msgpack) are excluded: they appear only inside reproduce-command examples,
# are hundreds of MB, and the committed evidence is the logs/metrics they
# produce.  Paths containing a literal `...` are command-line placeholders.
_CITE = re.compile(r"\b((?:runs|perf)/[\w.\-/]+\.(?:log|json|jsonl|md|png|py|yaml))")


def _tracked_files():
    out = subprocess.run(
        ["git", "ls-files"], cwd=REPO, capture_output=True, text=True,
        check=True,
    ).stdout
    return set(out.splitlines())


def _cited_paths():
    cites = []  # (doc, lineno, path)
    for doc in DOCS:
        p = os.path.join(REPO, doc)
        if not os.path.exists(p):
            continue
        with open(p) as f:
            for i, line in enumerate(f, 1):
                for m in _CITE.finditer(line):
                    if "..." not in m.group(1):
                        cites.append((doc, i, m.group(1)))
    return cites


def test_docs_cite_some_artifacts():
    """Sanity: the regex actually finds citations (guards against a silent
    no-op if doc formatting changes)."""
    assert len(_cited_paths()) > 20


def test_cited_run_artifacts_exist_and_are_tracked():
    tracked = _tracked_files()
    missing, untracked = [], []
    for doc, line, path in _cited_paths():
        base = path.rstrip("*")
        if any(base.startswith(lost) for lost in KNOWN_LOST):
            continue
        where = f"{doc}:{line} -> {path}"
        if not os.path.exists(os.path.join(REPO, base)):
            missing.append(where)
        elif base not in tracked:
            untracked.append(where)
    msg = ""
    if missing:
        msg += "cited artifacts MISSING from the tree:\n  " + "\n  ".join(missing)
    if untracked:
        msg += ("\ncited artifacts present but UNTRACKED (will be wiped "
                "between sessions — git add -f them):\n  "
                + "\n  ".join(untracked))
    assert not msg, msg


# ---- bench-row claims gate (VERDICT r4 next-round item 2): round 4 cited
# `flow_euler50/flow_heun15/t400_64px_images_per_sec_per_chip` as standing
# bench rows while no committed artifact had ever contained a value for them
# (BENCH_r04.json was rc:1/null).  A `*_per_chip` row name cited in the docs
# must appear with a NON-NULL value in at least one committed bench artifact.

_ROW = re.compile(r"\b([a-z0-9_]+_per_chip)\b")


def _bench_artifacts(tracked):
    """Committed files that can carry bench-row values."""
    return [p for p in tracked
            if re.fullmatch(r"BENCH_r\d+\.json", p)
            or re.fullmatch(r"runs/bench[\w.\-]*\.json", p)
            or re.fullmatch(r"perf/[\w.\-]*\.json", p)]


def _rows_with_values(tracked):
    """Row names that appear with a non-null numeric value in any committed
    bench artifact (raw-text scan: BENCH_r*.json wrap the JSON line in a
    `tail` string, so structured parsing can't reach it uniformly)."""
    val = re.compile(r'\\?"([a-z0-9_]+_per_chip)\\?"\s*:\s*[0-9]')
    found = set()
    for p in _bench_artifacts(tracked):
        fp = os.path.join(REPO, p)
        if not os.path.exists(fp):
            continue
        with open(fp, errors="replace") as f:
            found.update(val.findall(f.read()))
    return found


def test_cited_bench_rows_have_committed_values():
    tracked = _tracked_files()
    have = _rows_with_values(tracked)
    dangling = []
    for doc in DOCS + sorted(
            f"docs/{n}" for n in os.listdir(os.path.join(REPO, "docs"))
            if n.endswith(".md")):
        p = os.path.join(REPO, doc)
        if not os.path.exists(p):
            continue
        with open(p) as f:
            for i, line in enumerate(f, 1):
                for name in _ROW.findall(line):
                    if name not in have:
                        dangling.append(f"{doc}:{i} -> {name}")
    assert not dangling, (
        "bench rows cited in docs but NEVER valued in any committed bench "
        "artifact (run bench.py and git add -f the output JSON):\n  "
        + "\n  ".join(dangling))


def test_known_lost_list_is_not_stale():
    """If a 'lost' artifact reappears and gets committed, drop it from the
    allowlist so it is enforced again."""
    tracked = _tracked_files()
    stale = [p for p in KNOWN_LOST if p in tracked]
    assert not stale, f"remove from KNOWN_LOST (now committed): {stale}"


if __name__ == "__main__":
    pytest.main([__file__, "-q"])
