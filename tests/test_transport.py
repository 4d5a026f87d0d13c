"""Native transport tests (VERDICT round-1 weak #5): loopback push -> store
insert, RPC round-trip, param broadcast, client-gone/server-stop robustness.

Surface parity target: the agentlace API used by the reference
(async_sac_state_sim.py:79-235).
"""

import threading
import time

import numpy as np
import pytest

from serl_tpu.distributed.transport import (
    QueuedDataStore,
    TrainerClient,
    TrainerConfig,
    TrainerServer,
)

from tests._ports import next_port_pair, retry_bind


class ListStore:
    def __init__(self):
        self.items = []
        self.lock = threading.Lock()

    def insert(self, tr):
        with self.lock:
            self.items.append(tr)

    def __len__(self):
        with self.lock:
            return len(self.items)


def _make_server(cb):
    def factory(port):
        cfg = TrainerConfig(port_number=port, broadcast_port=port + 1)
        return TrainerServer(cfg, request_callback=cb), cfg
    (pair, cfg), _ = retry_bind(factory)
    return pair, cfg


@pytest.fixture()
def pair():
    server, cfg = _make_server(lambda t, p: {"echo": t, "got": p})
    store = ListStore()
    server.register_data_store("actor_env", store)
    server.start(threaded=True)
    client = TrainerClient(
        "actor_env", "127.0.0.1", cfg, data_store=QueuedDataStore(100),
        wait_for_server=True, timeout_s=10.0,
    )
    yield server, client, store
    client.stop()
    server.stop()


def _wait(pred, timeout=5.0):
    t0 = time.time()
    while time.time() - t0 < timeout:
        if pred():
            return True
        time.sleep(0.05)
    return False


def test_push_inserts_into_registered_store(pair):
    server, client, store = pair
    tr = {
        "observations": np.arange(10, dtype=np.float32),
        "actions": np.zeros(4, np.float32),
        "rewards": np.float32(1.5),
        "masks": np.float32(1.0),
        "dones": np.float32(0.0),
    }
    for _ in range(7):
        client.data_store.insert(tr)
    sent = client.update()
    assert sent == 7
    assert _wait(lambda: len(store) == 7), "server did not insert pushed transitions"
    got = store.items[0]
    np.testing.assert_array_equal(got["observations"], tr["observations"])
    assert float(got["rewards"]) == 1.5
    # queue drained client-side
    assert len(client.data_store) == 0
    assert client.update() == 0


def test_rpc_roundtrip(pair):
    server, client, store = pair
    resp = client.request("send-stats", {"eval": {"success": 0.5}})
    assert resp is not None
    assert resp["echo"] == "send-stats"
    assert float(resp["got"]["eval"]["success"]) == 0.5


def test_param_broadcast(pair):
    server, client, store = pair
    received = []
    evt = threading.Event()

    def cb(params):
        received.append(params)
        evt.set()

    client.recv_network_callback(cb)
    time.sleep(0.3)  # let the poll thread attach
    params = {
        "actor": {"kernel": np.random.randn(8, 4).astype(np.float32)},
        "step": np.int32(3),
    }
    server.publish_network(params)
    assert evt.wait(5.0), "client never received the published params"
    got = received[-1]
    np.testing.assert_array_equal(got["actor"]["kernel"], params["actor"]["kernel"])
    assert int(got["step"]) == 3


def test_queued_data_store_capacity():
    q = QueuedDataStore(3)
    for i in range(5):
        q.insert({"i": i})
    assert len(q) == 3
    items = q.drain()
    assert [it["i"] for it in items] == [2, 3, 4]  # oldest dropped


def test_client_connect_timeout():
    port = next_port_pair()
    cfg = TrainerConfig(port_number=port, broadcast_port=port + 1)
    with pytest.raises(ConnectionError):
        TrainerClient(
            "x", "127.0.0.1", cfg, wait_for_server=False, timeout_s=0.3
        )


def test_server_survives_client_disconnect():
    server, cfg = _make_server(lambda t, p: {"ok": 1})
    store = ListStore()
    server.register_data_store("a", store)
    server.start(threaded=True)
    try:
        c1 = TrainerClient("a", "127.0.0.1", cfg, data_store=QueuedDataStore(10),
                           timeout_s=10.0)
        c1.data_store.insert({"x": np.float32(1)})
        c1.update()
        assert _wait(lambda: len(store) == 1)
        c1.stop()  # abrupt from the server's perspective
        # a new client can still connect and work
        c2 = TrainerClient("a", "127.0.0.1", cfg, data_store=QueuedDataStore(10),
                           timeout_s=10.0)
        assert c2.request("t", {}) == {"ok": 1}
        c2.stop()
    finally:
        server.stop()


def test_actor_survives_learner_restart():
    """VERDICT r2 #9: kill the server mid-stream; the actor's pushes are
    re-queued (no data loss), and once a NEW server binds the same ports the
    client re-dials and delivers everything, including param broadcast."""
    server, cfg = _make_server(lambda t, p: {"gen": 1})
    store1 = ListStore()
    server.register_data_store("a", store1)
    server.start(threaded=True)

    client = TrainerClient(
        "a", "127.0.0.1", cfg, data_store=QueuedDataStore(100), timeout_s=10.0
    )
    received = []
    evt = threading.Event()
    client.recv_network_callback(lambda p: (received.append(p), evt.set()))
    time.sleep(0.3)

    client.data_store.insert({"i": np.float32(0)})
    assert client.update() == 1
    assert _wait(lambda: len(store1) == 1)

    server.stop()  # learner dies
    time.sleep(0.2)

    # pushes while the learner is down are re-queued, not lost
    for i in range(1, 4):
        client.data_store.insert({"i": np.float32(i)})
    assert client.update() == 0  # delivery failed -> requeued
    assert len(client.data_store) == 3

    # learner restarts on the same ports
    server2 = TrainerServer(cfg, request_callback=lambda t, p: {"gen": 2})
    store2 = ListStore()
    server2.register_data_store("a", store2)
    server2.start(threaded=True)
    try:
        # actor re-dials and flushes the backlog
        assert _wait(lambda: client.update() == 3, timeout=10.0), \
            "client did not reconnect and flush after learner restart"
        assert _wait(lambda: len(store2) == 3)
        assert sorted(float(t["i"]) for t in store2.items) == [1.0, 2.0, 3.0]
        # RPC works against the new server
        assert _wait(
            lambda: (client.request("t", {}) or {}).get("gen") == 2, timeout=10.0
        )
        # param broadcast reaches the re-subscribed client
        assert _wait(lambda: server2.publish_network({"w": np.float32(7)}) >= 1,
                     timeout=10.0), "new server never saw the subscriber"
        assert evt.wait(10.0), "client never received params from new server"
        assert float(received[-1]["w"]) == 7.0
    finally:
        client.stop()
        server2.stop()


def test_server_handles_midstream_client_death():
    """A client killed mid-push-stream must not wedge the server: other
    clients keep working and the dead connection is reaped."""
    server, cfg = _make_server(lambda t, p: {"ok": 1})
    store = ListStore()
    server.register_data_store("a", store)
    server.start(threaded=True)
    try:
        c1 = TrainerClient("a", "127.0.0.1", cfg, data_store=QueuedDataStore(50),
                           timeout_s=10.0)
        c2 = TrainerClient("a", "127.0.0.1", cfg, data_store=QueuedDataStore(50),
                           timeout_s=10.0)
        for i in range(5):
            c1.data_store.insert({"i": np.float32(i)})
        c1.update()
        assert _wait(lambda: len(store) == 5)
        # abrupt death: close the raw sockets without any protocol goodbye
        c1._lib.ts_client_destroy(c1._handle)
        c1._handle = None
        c1._running = False
        time.sleep(0.2)
        # the other client is unaffected
        c2.data_store.insert({"i": np.float32(99)})
        c2.update()
        assert _wait(lambda: len(store) == 6)
        assert c2.request("t", {}) == {"ok": 1}
        c2.stop()
    finally:
        server.stop()
