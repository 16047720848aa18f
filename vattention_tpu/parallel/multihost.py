"""Multi-host serving: jax.distributed init + replicated-engine control.

The reference runs multi-GPU serving with a single driver process, one
Ray actor per GPU, and NCCL groups
(sarathi-lean/sarathi/worker/base_worker.py:253-284 NCCL init,
engine/ray_utils.py:11-58 Ray control plane, benchmark_runner.py:235-285
replica resource mapping).  Multi-controller JAX inverts the shape: one
PROCESS PER HOST runs the SAME engine, the compiled step spans the
global mesh (tp over ICI, pp/dp over DCN), and XLA's collectives do all
device communication -- there is no per-layer RPC to hide.

What remains host-side is ordering: every process must (a) admit the
same requests at the same iteration and (b) invoke the same compiled
computation in the same order.  (b) falls out of determinism -- every
host runs identical engine logic over identical state (FCFS on
driver-assigned arrival order, shared PRNG seed, allocator bookkeeping
replicated).  (a) is the only real control plane: a tiny TCP broadcast
from the driver host carrying (iteration, [new requests]) markers --
bytes per step, vs the reference's per-step Ray RPC fan-out.
"""

from __future__ import annotations

import pickle
import socket
import struct
import threading
from typing import List, Optional

from vattention_tpu.logger import init_logger

logger = init_logger(__name__)


def init_multihost(coordinator_address: str, num_processes: int,
                   process_id: int, *,
                   local_device_count: Optional[int] = None) -> None:
    """jax.distributed bring-up (NCCL-init analog, ref
    base_worker.py:253-284).  On TPU pods the runtime discovers topology
    itself; ``local_device_count`` forces virtual CPU devices for the
    2-process CI tier."""
    import jax

    if local_device_count is not None:
        import os

        os.environ["XLA_FLAGS"] = (
            os.environ.get("XLA_FLAGS", "")
            + f" --xla_force_host_platform_device_count="
              f"{local_device_count}")
        jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(coordinator_address=coordinator_address,
                               num_processes=num_processes,
                               process_id=process_id)
    logger.info("multihost up: process %d/%d, %d local / %d global devices",
                process_id, num_processes, len(jax.local_devices()),
                len(jax.devices()))


def _send_msg(sock: socket.socket, obj) -> None:
    data = pickle.dumps(obj)
    sock.sendall(struct.pack("!I", len(data)) + data)


def _recv_msg(sock: socket.socket):
    hdr = b""
    while len(hdr) < 4:
        chunk = sock.recv(4 - len(hdr))
        if not chunk:
            raise ConnectionError("control-plane peer closed")
        hdr += chunk
    n = struct.unpack("!I", hdr)[0]
    data = b""
    while len(data) < n:
        chunk = sock.recv(min(n - len(data), 1 << 20))
        if not chunk:
            raise ConnectionError("control-plane peer closed")
        data += chunk
    return pickle.loads(data)


class RequestControlPlane:
    """Driver-host broadcast of request admissions.

    Driver (process 0) accepts follower connections and, once per
    engine iteration, broadcasts ``("tick", iteration, requests,
    stop)``.  Followers block on the marker before stepping, so every
    process admits identical requests at identical iterations -- the
    whole cross-host scheduling contract in one message type.
    """

    def __init__(self, process_id: int, num_processes: int,
                 port: int = 18923, driver_host: str = "localhost"):
        self.process_id = process_id
        self.num_processes = num_processes
        self.is_driver = process_id == 0
        self._pending: List[tuple] = []
        self._lock = threading.Lock()
        if self.is_driver:
            self._server = socket.create_server(("0.0.0.0", port))
            self._peers: List[socket.socket] = []
            for _ in range(num_processes - 1):
                conn, _ = self._server.accept()
                self._peers.append(conn)
        else:
            for attempt in range(600):
                try:
                    self._sock = socket.create_connection(
                        (driver_host, port), timeout=5)
                    break
                except OSError:
                    import time

                    time.sleep(0.1)
            else:
                raise ConnectionError("driver control plane unreachable")

    # -- driver side ---------------------------------------------------- #
    def submit(self, request_payload: tuple) -> None:
        """Queue a request for broadcast at the next tick (driver)."""
        assert self.is_driver
        with self._lock:
            self._pending.append(request_payload)

    def tick(self, iteration: int, *, stop: bool = False) -> List[tuple]:
        """Driver: flush queued requests to every follower and return
        them for local admission."""
        assert self.is_driver
        with self._lock:
            batch, self._pending = self._pending, []
        msg = ("tick", iteration, batch, stop)
        for peer in self._peers:
            _send_msg(peer, msg)
        return batch

    # -- follower side --------------------------------------------------- #
    def wait_tick(self, iteration: int):
        """Follower: block for the driver's marker for this iteration.
        Returns (requests, stop)."""
        assert not self.is_driver
        tag, it, batch, stop = _recv_msg(self._sock)
        assert tag == "tick" and it == iteration, (tag, it, iteration)
        return batch, stop

    def close(self) -> None:
        if self.is_driver:
            for peer in self._peers:
                peer.close()
            self._server.close()
        else:
            self._sock.close()


def serve_multihost(engine, control: RequestControlPlane, *,
                    requests: Optional[List[dict]] = None,
                    max_steps: int = 10_000) -> dict:
    """Replicated continuous-batching loop over the global mesh.

    Driver admits ``requests`` (dicts of add_request kwargs) through the
    control plane; every process -- driver included -- applies the same
    admissions at the same iteration and calls ``engine.step()``, whose
    compiled body spans all hosts' devices.  Returns
    {seq_id: token_ids} of finished requests (identical on every host,
    by construction).
    """
    outputs = {}
    queue = list(requests or [])
    it = 0
    while True:
        if control.is_driver:
            while queue:
                control.submit(("add", queue.pop(0)))
            stop = not queue and not engine.has_unfinished_requests() \
                and it > 0
            batch = control.tick(it, stop=stop)
        else:
            batch, stop = control.wait_tick(it)
        for tag, kwargs in batch:
            assert tag == "add"
            engine.add_request(**kwargs)
        if stop:
            break
        for out in engine.step():
            if out.finished:
                outputs[out.seq_id] = out.token_ids
        it += 1
        assert it < max_steps, "multihost serve did not converge"
    return outputs
