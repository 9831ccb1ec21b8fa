"""Taxonomy and id-mapper tests (parity with reference tools/category.py,
tools/id_mappers.py)."""

import numpy as np

from dasac_tpu.data import category, id_mappers


def test_class_names():
    names = category.get_class_names()
    assert len(names) == 19
    assert names[0] == "road"
    assert names[18] == "bicycle"
    assert category.get_num_classes() == 19


def test_trainid_cs_roundtrip():
    t2c = category.trainid_to_cs_table()
    c2t = category.cs_to_trainid_table()
    for l in category.LABELS:
        if l.trainId != 255:
            assert t2c[l.trainId] == l.id
            assert c2t[l.id] == l.trainId
    # unknown / void ids map to ignore
    assert c2t[0] == 255
    assert c2t[255] == 255


def test_colorize():
    mask = np.array([[0, 13], [255, 10]], dtype=np.uint8)
    rgb = category.colorize(mask)
    assert rgb.shape == (2, 2, 3)
    assert tuple(rgb[0, 0]) == (128, 64, 128)   # road
    assert tuple(rgb[0, 1]) == (0, 0, 142)      # car
    assert tuple(rgb[1, 0]) == (0, 0, 0)        # ignore
    assert tuple(rgb[1, 1]) == (70, 130, 180)   # sky


def test_gta_mapper_matches_cityscapes():
    m = id_mappers.get_mapper("gta")
    raw = np.array([[7, 8, 26], [0, 33, 99]], dtype=np.uint8)
    out = m.remap(raw)
    assert out.tolist() == [[0, 1, 13], [255, 18, 255]]


def test_synthia_mapper():
    m = id_mappers.get_mapper("synthia")
    raw = np.array([1, 3, 8, 13, 22, 0], dtype=np.uint8)
    out = m.remap(raw)
    # sky->10, road->0, car->13, parking->ignore, lanemarking->ignore, void->ignore
    assert out.tolist() == [10, 0, 13, 255, 255, 255]


def test_cs_mapper_ext():
    assert id_mappers.get_mapper("cs").ext() == "*labelIds.png"
