"""ROS bag v2.0 reader/converter: synthesize a bag byte-for-byte per the
format spec, read it back, and convert into the KAIST layout consumed by
``data/kaist.py`` (the reference's ingest path is ``rosbag play`` into
``fusion_ros.cc:117-120``)."""

import bz2
import os
import struct

import numpy as np

from ic_gvins_tpu.data import kaist, rosbag


def _field(name: str, value: bytes) -> bytes:
    f = name.encode() + b"=" + value
    return struct.pack("<I", len(f)) + f


def _record(fields: dict, data: bytes) -> bytes:
    header = b"".join(_field(k, v) for k, v in fields.items())
    return (
        struct.pack("<I", len(header)) + header
        + struct.pack("<I", len(data)) + data
    )


def _ser_header(stamp: float, frame: bytes = b"f") -> bytes:
    secs = int(stamp)
    nsecs = int(round((stamp - secs) * 1e9))
    return (
        struct.pack("<III", 7, secs, nsecs)
        + struct.pack("<I", len(frame)) + frame
    )


def _ser_imu(stamp, gyro, accel) -> bytes:
    return (
        _ser_header(stamp)
        + struct.pack("<4d", 0.0, 0.0, 0.0, 1.0)
        + struct.pack("<9d", *([0.0] * 9))
        + struct.pack("<3d", *gyro)
        + struct.pack("<9d", *([0.0] * 9))
        + struct.pack("<3d", *accel)
        + struct.pack("<9d", *([0.0] * 9))
    )


def _ser_navsatfix(stamp, lat, lon, alt, var=0.01) -> bytes:
    cov = [var, 0, 0, 0, var, 0, 0, 0, var]
    return (
        _ser_header(stamp)
        + struct.pack("<bH", 0, 1)
        + struct.pack("<3d", lat, lon, alt)
        + struct.pack("<9d", *cov)
        + struct.pack("<B", 2)
    )


def _ser_image(stamp, img: np.ndarray) -> bytes:
    h, w = img.shape
    enc = b"mono8"
    return (
        _ser_header(stamp)
        + struct.pack("<II", h, w)
        + struct.pack("<I", len(enc)) + enc
        + struct.pack("<B", 0)
        + struct.pack("<I", w)
        + struct.pack("<I", h * w) + img.tobytes()
    )


def _connection(conn: int, topic: str, mtype: str) -> bytes:
    data = _field("topic", topic.encode()) + _field("type", mtype.encode()) \
        + _field("md5sum", b"x") + _field("message_definition", b"")
    return _record(
        {"op": b"\x07", "conn": struct.pack("<I", conn),
         "topic": topic.encode()},
        data,
    )


def _message(conn: int, stamp: float, payload: bytes) -> bytes:
    secs = int(stamp)
    nsecs = int(round((stamp - secs) * 1e9))
    return _record(
        {"op": b"\x02", "conn": struct.pack("<I", conn),
         "time": struct.pack("<II", secs, nsecs)},
        payload,
    )


def make_bag(path, n_imu=20, n_gnss=3, n_img=2, compression="none"):
    chunk = b""
    chunk += _connection(0, "/imu/data_raw", "sensor_msgs/Imu")
    chunk += _connection(1, "/gps/fix", "sensor_msgs/NavSatFix")
    chunk += _connection(2, "/cam/image", "sensor_msgs/Image")
    t0 = 1544590798.0
    for k in range(n_imu):
        t = t0 + 0.01 * k
        chunk += _message(0, t, _ser_imu(t, [0.01, -0.02, 0.03],
                                         [0.1, 0.2, 9.8]))
    for k in range(n_gnss):
        t = t0 + 0.1 * k
        chunk += _message(1, t, _ser_navsatfix(t, 36.37 + 1e-6 * k,
                                               127.36, 72.5))
    rng = np.random.RandomState(0)
    for k in range(n_img):
        t = t0 + 0.05 * k
        img = (rng.rand(8, 12) * 255).astype(np.uint8)
        chunk += _message(2, t, _ser_image(t, img))

    if compression == "bz2":
        payload = bz2.compress(chunk)
    else:
        payload = chunk
    rec_chunk = _record(
        {"op": b"\x05", "compression": compression.encode(),
         "size": struct.pack("<I", len(chunk))},
        payload,
    )
    bag_header = _record(
        {"op": b"\x03", "index_pos": struct.pack("<Q", 0),
         "conn_count": struct.pack("<I", 3),
         "chunk_count": struct.pack("<I", 1)},
        b" " * 4096,  # spec: header record padded
    )
    with open(path, "wb") as f:
        f.write(b"#ROSBAG V2.0\n")
        f.write(bag_header)
        f.write(rec_chunk)


def test_read_bag_roundtrip(tmp_path):
    for compression in ("none", "bz2"):
        path = os.path.join(tmp_path, f"t_{compression}.bag")
        make_bag(path, compression=compression)
        msgs = list(rosbag.read_bag(path))
        imu = [m for m in msgs if m.type == "sensor_msgs/Imu"]
        gnss = [m for m in msgs if m.type == "sensor_msgs/NavSatFix"]
        img = [m for m in msgs if m.type == "sensor_msgs/Image"]
        assert len(imu) == 20 and len(gnss) == 3 and len(img) == 2
        assert np.allclose(imu[0].msg["angular_velocity"], [0.01, -0.02, 0.03])
        assert np.allclose(imu[0].msg["linear_acceleration"], [0.1, 0.2, 9.8])
        assert abs(gnss[1].msg["latitude"] - (36.37 + 1e-6)) < 1e-12
        assert np.allclose(gnss[0].msg["position_covariance"],
                           0.01 * np.eye(3))
        assert img[0].msg["image"].shape == (8, 12)
        # timestamps increase within each topic
        ts = [m.msg["stamp"] for m in imu]
        assert all(b > a for a, b in zip(ts, ts[1:]))


def test_bag_topics(tmp_path):
    path = os.path.join(tmp_path, "t.bag")
    make_bag(path)
    topics = rosbag.bag_topics(path)
    assert topics["/imu/data_raw"] == "sensor_msgs/Imu"
    assert topics["/gps/fix"] == "sensor_msgs/NavSatFix"


def test_convert_bag_feeds_kaist_loader(tmp_path):
    path = os.path.join(tmp_path, "t.bag")
    make_bag(path, compression="bz2")
    out = os.path.join(tmp_path, "data")
    counts = rosbag.convert_bag(
        path, out, image_topic="/cam/image", image_format="npy"
    )
    assert counts == dict(imu=20, gnss=3, images=2)
    imu = kaist.load_imu_csv(os.path.join(out, "sensor_data", "xsens_imu.csv"))
    assert imu.n == 20
    # increments = rate * dt (fusion_ros.cc:145-150); dt = 10 ms
    assert np.allclose(np.asarray(imu.dtheta[1]),
                       np.array([0.01, -0.02, 0.03]) * 0.01, atol=1e-9)
    gnss, origin = kaist.load_gps_csv(
        os.path.join(out, "sensor_data", "vrs_gps.csv"),
        cols=kaist.GpsColumns(std=(4, 5, 6)),
    )
    assert gnss.p.shape[0] == 3
    assert np.allclose(np.asarray(gnss.std), 0.1)
    # second fix is ~0.111 m north of the first (1e-6 deg of latitude)
    d = np.asarray(gnss.p[1] - gnss.p[0])
    assert abs(d[0] - 0.1108) < 0.01 and abs(d[1]) < 1e-3
