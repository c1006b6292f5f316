"""Live ROS1 ingestion tests: a fake in-process ROS master + TCPROS publisher
exercise io.ros_live's full protocol path (XML-RPC registration, requestTopic,
TCPROS header handshake, message framing, alignment, idle shutdown) with no
ROS installation — the stand-in for a live Coco-LIC graph (mapping.cpp:203-242).
"""

import socket
import struct
import threading
import xmlrpc.client
from xmlrpc.server import SimpleXMLRPCServer

import numpy as np
import pytest
from ros_wire import mk_frames, ser_cloud, ser_image, ser_pose

from gaussian_lic_tpu.io import ros_live


class FakeGraph:
    """A minimal ROS master + one TCPROS publisher for the three topics."""

    TOPICS = {
        "/points_for_gs": "sensor_msgs/PointCloud2",
        "/pose_for_gs": "geometry_msgs/PoseStamped",
        "/image_for_gs": "sensor_msgs/Image",
    }

    def __init__(self, messages_by_topic, register_inline=True,
                 reject_header=False):
        """messages_by_topic: {topic: [serialized bytes, ...]} sent on connect.
        register_inline=False returns no publishers from registerSubscriber
        and delivers them via publisherUpdate instead."""
        self.messages = messages_by_topic
        self.reject_header = reject_header
        self.subscriber_uris = {}
        self._threads = []

        # --- TCPROS listeners, one port per topic ---
        self.ports = {}
        self._listeners = {}
        for topic in self.TOPICS:
            srv = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
            srv.bind(("127.0.0.1", 0))
            srv.listen(4)
            self.ports[topic] = srv.getsockname()[1]
            self._listeners[topic] = srv
            th = threading.Thread(
                target=self._serve_topic, args=(topic, srv), daemon=True
            )
            th.start()
            self._threads.append(th)

        # --- publisher slave XML-RPC (requestTopic) ---
        self.pub_xmlrpc = SimpleXMLRPCServer(
            ("127.0.0.1", 0), logRequests=False, allow_none=True
        )
        self.pub_uri = "http://127.0.0.1:%d/" % self.pub_xmlrpc.server_address[1]

        def requestTopic(caller_id, topic, protocols):
            assert ["TCPROS"] in [list(p) for p in protocols]
            return (1, "ready", ["TCPROS", "127.0.0.1", self.ports[topic]])

        self.pub_xmlrpc.register_function(requestTopic, "requestTopic")
        th = threading.Thread(
            target=self.pub_xmlrpc.serve_forever, daemon=True
        )
        th.start()
        self._threads.append(th)

        # --- master XML-RPC ---
        self.master = SimpleXMLRPCServer(
            ("127.0.0.1", 0), logRequests=False, allow_none=True
        )
        self.master_uri = "http://127.0.0.1:%d/" % self.master.server_address[1]
        graph = self

        def registerSubscriber(caller_id, topic, topic_type, caller_api):
            assert topic_type == graph.TOPICS[topic]
            graph.subscriber_uris[topic] = caller_api
            if register_inline:
                return (1, "", [graph.pub_uri])
            return (1, "", [])

        def unregisterSubscriber(caller_id, topic, caller_api):
            graph.subscriber_uris.pop(topic, None)
            return (1, "", 1)

        self.master.register_function(registerSubscriber, "registerSubscriber")
        self.master.register_function(
            unregisterSubscriber, "unregisterSubscriber"
        )
        th = threading.Thread(target=self.master.serve_forever, daemon=True)
        th.start()
        self._threads.append(th)

    def push_publisher_update(self, topic):
        """Master-side publisherUpdate callback to the subscriber's slave."""
        sub = xmlrpc.client.ServerProxy(self.subscriber_uris[topic])
        sub.publisherUpdate("/master", topic, [self.pub_uri])

    def _serve_topic(self, topic, srv):
        while True:
            try:
                conn, _ = srv.accept()
            except OSError:
                return
            with conn:
                (hlen,) = struct.unpack("<I", self._recv(conn, 4))
                hdr = ros_live._decode_tcpros_header(self._recv(conn, hlen))
                assert hdr["topic"] == topic
                assert hdr["type"] == self.TOPICS[topic]
                assert len(hdr["md5sum"]) == 32 or hdr["md5sum"] == "*"
                if self.reject_header:
                    conn.sendall(ros_live._encode_tcpros_header(
                        {"error": "bad md5sum"}
                    ))
                    continue
                conn.sendall(ros_live._encode_tcpros_header({
                    "callerid": "/fake_pub",
                    "md5sum": hdr["md5sum"],
                    "type": self.TOPICS[topic],
                    "latching": "0",
                }))
                for raw in self.messages.get(topic, []):
                    conn.sendall(struct.pack("<I", len(raw)) + raw)
                # keep open until the peer closes (subscriber idle-times out)
                try:
                    conn.settimeout(5.0)
                    conn.recv(1)
                except OSError:
                    pass

    @staticmethod
    def _recv(conn, n):
        buf = b""
        while len(buf) < n:
            b = conn.recv(n - len(buf))
            if not b:
                raise ConnectionError("closed")
            buf += b
        return buf

    def close(self):
        for srv in self._listeners.values():
            srv.close()
        self.master.shutdown()
        self.master.server_close()
        self.pub_xmlrpc.shutdown()
        self.pub_xmlrpc.server_close()


def _messages(frames):
    return {
        "/points_for_gs": [ser_cloud(s, p, c) for s, p, c, _, _, _ in frames],
        "/pose_for_gs": [ser_pose(s, t, q) for s, _, _, t, q, _ in frames],
        "/image_for_gs": [ser_image(s, img) for s, _, _, _, _, img in frames],
    }


class TestRosLive:
    def test_live_roundtrip(self, rng):
        frames = mk_frames(rng, n=4)
        graph = FakeGraph(_messages(frames))
        try:
            stream = ros_live.RosLiveStream(
                master_uri=graph.master_uri, idle_timeout=2.0
            )
            out = list(stream)
        finally:
            graph.close()
        assert len(out) == len(frames)
        for fi, (stamp, pts, cols, t, q, img) in zip(out, frames):
            assert abs(fi.timestamp - stamp) < 1e-6
            np.testing.assert_allclose(fi.points, pts, rtol=1e-6)
            np.testing.assert_allclose(fi.colors, cols, atol=1 / 255 + 1e-3)
            np.testing.assert_allclose(fi.t_wc, t, rtol=1e-6)
            np.testing.assert_array_equal(fi.image, img)

    def test_unregisters_on_stop(self, rng):
        frames = mk_frames(rng, n=1)
        graph = FakeGraph(_messages(frames))
        try:
            stream = ros_live.RosLiveStream(
                master_uri=graph.master_uri, idle_timeout=1.0
            )
            out = list(stream)
            assert len(out) == 1
            assert graph.subscriber_uris == {}  # unregistered on stop
        finally:
            graph.close()

    def test_late_publisher_via_publisher_update(self, rng):
        """Publishers announced after registration arrive via publisherUpdate."""
        frames = mk_frames(rng, n=2)
        graph = FakeGraph(_messages(frames), register_inline=False)
        try:
            stream = ros_live.RosLiveStream(
                master_uri=graph.master_uri, idle_timeout=3.0
            )
            stream.start()
            # master later announces the publisher for each topic
            for topic in FakeGraph.TOPICS:
                graph.push_publisher_update(topic)
            out = list(stream)
        finally:
            graph.close()
        assert len(out) == len(frames)

    def test_rejected_handshake_yields_nothing(self, rng):
        frames = mk_frames(rng, n=2)
        graph = FakeGraph(_messages(frames), reject_header=True)
        try:
            stream = ros_live.RosLiveStream(
                master_uri=graph.master_uri, idle_timeout=0.5
            )
            out = list(stream)
        finally:
            graph.close()
        assert out == []
