"""Containers (tensor + JSON) and ring buffers."""

import numpy as np

from rspt_tpu.containers import (JsonSerializable, Tensor, get_dimensions,
                                 json_property, tensor_f32, tensor_i32)
from rspt_tpu.io.ring import ContinuousRing, IoBuffer


def test_tensor_shapes_and_views():
    t = tensor_i32(3, 4)
    assert (t.d1, t.d2) == (3, 4)
    t[1, 2] = 42
    v = t.view(12)
    assert v.a[6] == 42
    t.unsqueeze(0)
    assert t.shape() == [1, 3, 4]
    t.squeeze()
    assert t.shape() == [3, 4]


def test_tensor_json_roundtrip():
    t = tensor_f32(2, 3)
    t.a[:] = np.arange(6).reshape(2, 3)
    s = t.to_json()
    t2 = tensor_f32(json_text=s)
    assert t == t2
    assert get_dimensions(s) == [2, 3]


def test_tensor_wrap_zero_copy():
    buf = np.arange(12, dtype=np.int32).tobytes()
    t = Tensor.wrap_around_bytes(buf, (3, 4), np.int32)
    assert t.a[2, 3] == 11


def test_json_serializable_config():
    class Cfg(JsonSerializable):
        bps = json_property(4)
        channels = json_property(12)
        name = json_property("xdelta_hzr")

    c = Cfg(channels=3)
    s = c.to_json()
    c2 = Cfg(json_text=s)
    assert c2.channels == 3 and c2.bps == 4 and c == c2


def test_continuous_ring_contiguity():
    # reference ctor semantics: starts with `size` zeros — pass 0 for
    # an empty ring (as fir_filter.cpp:35 does)
    r = ContinuousRing(0, np.int32)
    r.push_elements_back([1, 2, 3, 4])
    r.pop_front()
    r.push_back(5)
    np.testing.assert_array_equal(r.data, [2, 3, 4, 5])
    # force many wraps: data must stay contiguous & correct
    for i in range(100):
        r.pop_front()
        r.push_back(6 + i)
    assert r.data.flags["C_CONTIGUOUS"]
    np.testing.assert_array_equal(r.data, [102, 103, 104, 105])
    w = r.enlarge_back(2)
    w[:] = [7, 8]
    assert list(r.data[-2:]) == [7, 8]


def test_io_buffer_handoff():
    iob = IoBuffer(16, nr_max_packets=4)
    assert iob.get_next_filled_address() is None
    p1 = iob.get_next_address_to_fill()
    p1[:] = 1
    # p1 is still "filling" until the next claim publishes it
    assert iob.get_next_filled_address() is None
    p2 = iob.get_next_address_to_fill()
    p2[:] = 2
    got = iob.get_next_filled_address()
    assert got is not None and got[0] == 1
    assert iob.get_next_filled_address() is None  # p2 not yet published


def test_array_of_tensors():
    """array_of_tensors parity (ZaxTensor.h:1491-1528): indexing,
    resize, size, equality, JSON round-trip of the m_data vector."""
    from rspt_tpu.containers.tensor import ArrayOfTensors, tensor_i32

    arr = ArrayOfTensors(tensor_i32, 2)
    assert arr.size() == len(arr) == 2
    arr[0].resize(3)
    arr[0][0], arr[0][1], arr[0][2] = 1, 2, 3
    arr.resize(3)
    assert arr.size() == 3
    arr[2].resize(2)
    arr[2][0] = 7

    other = ArrayOfTensors(tensor_i32)
    other.from_json(arr.to_json())
    assert other == arr and arr == other
    other[2][0] = 8
    assert not (other == arr)
    arr.resize(1)
    assert arr.size() == 1 and not (arr == other)
