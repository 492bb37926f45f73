"""Replication diff downloader (SURVEY §2.1 S5 — the HTTP half).

Parity target: vendor go-osm replication/internal/source/source.go (the
`downloader` type) and the import loop's exponential backoff in
update/cmd.go:386-411 (`expBackoff`, 2 s min doubling to a max). Behavior
reproduced:

- osmosis sequence layout ``AAA/BBB/CCC`` (``seqPath``, source.go:38-44);
- fetch ``<base>/<seq-path>.osc.gz`` and the sibling ``.state.txt`` into a
  local landing dir, atomically (tmp file + rename, source.go:142-158) and
  idempotently (existing file is kept, source.go:114-116);
- HTTP 404 -> ``NotAvailable`` -> fixed not-yet-published wait
  (source.go:134-136, 165-175: 10 s for minutely feeds); transport errors
  -> exponential backoff 2 s doubling to 5 min (update/cmd.go:386-411);
- head state: ``<base>/state.txt`` gives the newest published sequence
  (update/cmd.go `currentState`).

The transport is ``urllib`` so ``file://`` fixtures and a loopback
``http.server`` exercise the full code path in tests — no network needed.
The downloaded landing dir is exactly what `ReplicationRunner`
(diff/runner.py) polls, so download and apply compose without glue.
"""

from __future__ import annotations

import os
import time
import urllib.error
import urllib.request
from dataclasses import dataclass, field
from pathlib import Path
from typing import Callable


class NotAvailable(Exception):
    """The sequence file is not (yet) published at the remote."""

    def __init__(self, url: str):
        super().__init__(f"file not available: {url}")
        self.url = url


def seq_path(seq: int) -> str:
    """N -> AAA/BBB/CCC (source.go:38-44)."""
    return f"{seq // 1_000_000:03d}/{(seq // 1000) % 1000:03d}/{seq % 1000:03d}"


class ExpBackoff:
    """2 s doubling to 5 min, resettable (update/cmd.go:386-411)."""

    def __init__(self, minimum: float = 2.0, maximum: float = 300.0):
        self.minimum = minimum
        self.maximum = maximum
        self.current = minimum

    def next_wait(self) -> float:
        w = self.current
        self.current = min(self.current * 2, self.maximum)
        return w

    def reset(self) -> None:
        self.current = self.minimum


@dataclass
class DiffDownloader:
    """Mirror a replication endpoint's sequence files into a landing dir.

    ``url`` is the feed base (e.g. ``…/replication/minute/``); ``dest`` is
    the local dir `ReplicationRunner` polls. ``sleep`` is injectable so
    tests assert the backoff schedule instead of sleeping through it.
    """

    url: str
    dest: str
    file_ext: str = ".osc.gz"
    state_ext: str = ".state.txt"
    na_wait: float = 10.0  # 404 wait for minutely feeds (source.go:78-85)
    timeout: float = 30.0
    user_agent: str = "imposm3-spark"
    sleep: Callable[[float], None] = time.sleep
    backoff: ExpBackoff = field(default_factory=ExpBackoff)

    def _fetch(self, url: str, dest: Path) -> None:
        if dest.exists():  # idempotent re-run (source.go:114-116)
            return
        dest.parent.mkdir(parents=True, exist_ok=True)
        req = urllib.request.Request(url, headers={"User-Agent": self.user_agent})
        try:
            with urllib.request.urlopen(req, timeout=self.timeout) as resp:
                body = resp.read()
        except urllib.error.HTTPError as e:
            if e.code == 404:
                raise NotAvailable(url) from None
            raise
        except (urllib.error.URLError, FileNotFoundError) as e:
            # file:// transport surfaces missing fixtures as URLError/FNF
            reason = getattr(e, "reason", e)
            if isinstance(reason, FileNotFoundError) or isinstance(e, FileNotFoundError):
                raise NotAvailable(url) from None
            raise
        tmp = Path(f"{dest}~{os.getpid()}")
        tmp.write_bytes(body)
        tmp.rename(dest)  # atomic publish (source.go:142-158)

    def download(self, seq: int, ext: str) -> Path:
        """One file, one attempt. Raises NotAvailable / transport errors."""
        rel = seq_path(seq) + ext
        dest = Path(self.dest) / rel
        self._fetch(self.url.rstrip("/") + "/" + rel, dest)
        return dest

    def download_till_success(self, seq: int, ext: str, max_tries: int | None = None) -> bool:
        """Retry until the file lands (source.go:163-185): 404 waits
        ``na_wait`` (the diff simply isn't published yet), transport errors
        wait on the exponential backoff. Returns True when no retry was
        needed (used by callers to detect 'caught up')."""
        tries = 0
        while True:
            try:
                self.download(seq, ext)
                self.backoff.reset()
                return tries == 0
            except NotAvailable as e:
                err, wait = e, self.na_wait
            except (urllib.error.URLError, OSError) as e:
                err, wait = e, self.backoff.next_wait()
            tries += 1
            if max_tries is not None and tries >= max_tries:
                raise err
            self.sleep(wait)

    def fetch_sequence(self, seq: int, max_tries: int | None = None) -> bool:
        """State + diff for one sequence (state first, like
        source.go:218-220). Returns True if both were already published."""
        first = self.download_till_success(seq, self.state_ext, max_tries)
        first &= self.download_till_success(seq, self.file_ext, max_tries)
        return first

    def head_sequence(self) -> int:
        """Newest published sequence from ``<base>/state.txt``
        (update/cmd.go currentState)."""
        from imposm3_spark.diff.runner import parse_state_txt

        req = urllib.request.Request(
            self.url.rstrip("/") + "/state.txt", headers={"User-Agent": self.user_agent}
        )
        with urllib.request.urlopen(req, timeout=self.timeout) as resp:
            text = resp.read().decode()
        return int(parse_state_txt(text)["sequenceNumber"])

    def mirror(self, from_seq: int, to_seq: int | None = None, max_tries: int | None = 1) -> int:
        """Download sequences [from_seq, to_seq] (to_seq defaults to the
        remote head). Returns the last sequence landed. With max_tries=1
        this is a catch-up pass that stops at the first unpublished file."""
        if to_seq is None:
            to_seq = self.head_sequence()
        last = from_seq - 1
        for seq in range(from_seq, to_seq + 1):
            try:
                self.fetch_sequence(seq, max_tries=max_tries)
            except (NotAvailable, urllib.error.URLError, OSError):
                break
            last = seq
        return last
