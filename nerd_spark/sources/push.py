"""Push-channel bridge: a socket listener that lands newline-delimited
JSON messages into the ingest spool.

The reference's MISP live feed is a ZMQ SUB socket pushing JSON
events (reference: NERDd/misp_receiver.py:268-312); its RabbitMQ hop
pushes IDEA tasks the same way (common/task_queue.py:203-251). The
Spark-native mapping: a PUSH CHANNEL only needs to land messages in
the spool directory — the Structured Streaming file source (or the
Kafka source, sources/idea.py) takes over from there, so the bridge
is deliberately tiny and runs OUTSIDE the Spark driver (a sidecar, as
the reference's receivers are separate daemons).

This implementation uses a stdlib TCP line listener so the full push
-> spool -> streaming-ingest path is EXECUTED and tested over
loopback in this sandbox (zmq is not installed; a zmq SUB socket
plugs into the same `_drain_lines` -> `_commit_file` seam). Files
commit atomically (tmp name, then rename) so the file source never
observes a half-written batch — the same claim-by-rename discipline
as the reference's warden spool.
"""

from __future__ import annotations

import os
import socket
import threading
import time


class SpoolReceiver:
    """Accept line-oriented JSON pushes on a TCP port and commit them
    to `spool_dir` in bounded batches."""

    def __init__(
        self,
        spool_dir: str,
        host: str = "127.0.0.1",
        port: int = 0,
        max_lines_per_file: int = 1000,
    ) -> None:
        os.makedirs(spool_dir, exist_ok=True)
        self.spool_dir = spool_dir
        self.max_lines = max_lines_per_file
        self._srv = socket.create_server((host, port))
        self._srv.settimeout(0.2)
        self.port = self._srv.getsockname()[1]
        self._stop = threading.Event()
        self._thread: threading.Thread | None = None
        self._seq = 0

    def _commit_file(self, lines: list[bytes]) -> None:
        if not lines:
            return
        self._seq += 1
        name = f"push_{os.getpid()}_{self._seq:06d}.json"
        tmp = os.path.join(self.spool_dir, f".tmp.{name}")
        with open(tmp, "wb") as f:
            f.write(b"\n".join(lines) + b"\n")
        # atomic publish: the streaming file source lists the spool
        # concurrently and must never see a partial file (dot-prefixed
        # tmp names are additionally ignored by Spark's source)
        os.rename(tmp, os.path.join(self.spool_dir, name))

    def _drain_lines(self, conn: socket.socket) -> None:
        buf = b""
        batch: list[bytes] = []
        conn.settimeout(0.2)
        while not self._stop.is_set():
            try:
                chunk = conn.recv(65536)
            except socket.timeout:
                continue
            if not chunk:
                break
            buf += chunk
            while b"\n" in buf:
                line, buf = buf.split(b"\n", 1)
                if line.strip():
                    batch.append(line)
                if len(batch) >= self.max_lines:
                    self._commit_file(batch)
                    batch = []
        if buf.strip():
            batch.append(buf)
        self._commit_file(batch)

    def _serve(self) -> None:
        while not self._stop.is_set():
            try:
                conn, _ = self._srv.accept()
            except socket.timeout:
                continue
            with conn:
                self._drain_lines(conn)

    def start(self) -> "SpoolReceiver":
        self._thread = threading.Thread(target=self._serve, daemon=True)
        self._thread.start()
        return self

    def stop(self) -> None:
        self._stop.set()
        if self._thread:
            self._thread.join(timeout=5)
        self._srv.close()


def push_lines(host: str, port: int, lines: list[str], timeout: float = 5) -> None:
    """Client side (test/demo helper): push newline-delimited messages."""
    with socket.create_connection((host, port), timeout=timeout) as s:
        s.sendall(("\n".join(lines) + "\n").encode())


def wait_for_spool_files(spool_dir: str, n: int, timeout: float = 10) -> bool:
    """Block until >= n committed files exist (test helper)."""
    deadline = time.time() + timeout
    while time.time() < deadline:
        files = [f for f in os.listdir(spool_dir) if not f.startswith(".")]
        if len(files) >= n:
            return True
        time.sleep(0.05)
    return False
