"""Raw-dataset label-id -> trainId mappers as vectorized uint8 lookup tables.

Replaces the reference's per-pixel Python loops (``tools/id_mappers.py:18-202``)
with single-gather LUT remapping; the mapping facts are the public dataset
conventions (Cityscapes labelIds, GTA5 Cityscapes-compatible ids, SYNTHIA ids).
"""

import numpy as np
from PIL import Image

from dasac_tpu.data.category import LABELS, IGNORE_LABEL

# SYNTHIA id -> Cityscapes trainId (see the SYNTHIA-AL readme class table;
# parity with reference tools/id_mappers.py:52-70).  Ids absent from the map
# (void 0, parking 13, road-work 14, lanemarking 22) go to ignore.
_SYNTHIA_TO_TRAIN = {
    1: 10,   # sky
    2: 2,    # building
    3: 0,    # road
    4: 1,    # sidewalk
    5: 4,    # fence
    6: 8,    # vegetation
    7: 5,    # pole
    8: 13,   # car
    9: 7,    # traffic sign
    10: 11,  # pedestrian -> person
    11: 18,  # bicycle
    12: 17,  # motorcycle
    15: 6,   # traffic light
    16: 9,   # terrain
    17: 12,  # rider
    18: 14,  # truck
    19: 15,  # bus
    20: 16,  # train
    21: 3,   # wall
}


def _lut_from_map(mapping):
    table = np.full(256, IGNORE_LABEL, dtype=np.uint8)
    for raw_id, train_id in mapping.items():
        table[raw_id] = train_id
    return table


class _LUTMapper:
    """Reads a label image and remaps raw ids -> trainIds via one LUT gather."""

    LUT = None
    EXT = "*.png"

    @classmethod
    def read(cls, filepath):
        return np.asarray(Image.open(filepath), dtype=np.uint8)

    @classmethod
    def remap(cls, raw):
        return cls.LUT[np.asarray(raw, dtype=np.uint8)]

    @classmethod
    def ext(cls):
        return cls.EXT

    # dict-style access for parity with the reference mappers
    def __getitem__(self, key):
        v = int(self.LUT[key])
        if v == IGNORE_LABEL and key not in (0,):
            # distinguish "maps to ignore" from "unknown id": both return 255,
            # matching reference behavior of only listing known ids
            pass
        return v


class CityscapesMapper(_LUTMapper):
    """Cityscapes labelIds -> trainIds (the LABELS table itself)."""

    LUT = _lut_from_map({l.id: l.trainId for l in LABELS if l.trainId != 255})
    EXT = "*labelIds.png"


class GameMapper(_LUTMapper):
    """GTA5 uses Cityscapes-compatible ids; identical mapping."""

    LUT = CityscapesMapper.LUT
    EXT = "*.png"


class SynthiaMapper(_LUTMapper):
    LUT = _lut_from_map(_SYNTHIA_TO_TRAIN)
    EXT = "*.png"

    @classmethod
    def read(cls, filepath):
        # SYNTHIA ground truth is 16-bit RGB PNG; the class id is the VALUE
        # of channel 0 (reference reads it via imageio FreeImage:
        # tools/id_mappers.py:75-77).  Pillow truncates 16-bit channels to
        # the HIGH byte (every id 1..255 -> 0 -> all-ignore masks), so
        # 16-bit files go through the real 16-bit decoder.
        with open(filepath, "rb") as f:
            header = f.read(25)
        # IHDR bit-depth byte sits at offset 24 (8 sig + 8 chunk head + 8 w/h)
        if header[:8] == b"\x89PNG\r\n\x1a\n" and len(header) == 25 \
                and header[24] == 16:
            from dasac_tpu.data.png16 import read_png16

            arr = read_png16(filepath)
        else:
            arr = np.asarray(Image.open(filepath))
        if arr.ndim == 3:
            arr = arr[:, :, 0]
        return np.clip(arr, 0, 255).astype(np.uint8)


def get_mapper(dataname):
    maps = {"cs": CityscapesMapper, "synthia": SynthiaMapper, "gta": GameMapper}
    key = dataname.lower()
    assert key in maps, "Specify data from [cs|synthia|gta]"
    return maps[key]
