"""HEVC SEI messages: write + parse for the common payload types.

Parity targets (reference: hm-16.5rc1/source/Lib/TLibCommon/SEI.h:99-521,
writers TLibEncoder/SEIwrite.cpp, parsers TLibDecoder/SEIread.cpp):
buffering period (:157), picture timing (:187), user data unregistered,
recovery point (:235), active parameter sets, frame packing arrangement,
tone mapping info, mastering display colour volume, content light level.
The decoded-picture-hash SEI (:118) lives with the encoders
(intra_codec._hash_sei) since it is computed from the recon.

Simplifications vs the reference (documented, parse-compatible with our
writer): buffering period assumes the default 24-bit HRD delay lengths
(initial_cpb_removal_delay_length_minus1 = 23, TComHRD defaults) and a
single NAL-HRD schedule; picture timing carries only the frame-field
info fields (the no-HRD variant HM emits when frame_field_info_present
and CPB params are absent).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from video_codecs_tpu.entropy import bitstream as bs
from video_codecs_tpu.entropy.bitstream import BitReader, BitWriter

# payload types (spec D.2.1 / SEI.h PayloadType enum)
BUFFERING_PERIOD = 0
PICTURE_TIMING = 1
USER_DATA_UNREGISTERED = 5
RECOVERY_POINT = 6
TONE_MAPPING_INFO = 23
FRAME_PACKING = 45
ACTIVE_PARAMETER_SETS = 129
DECODED_PICTURE_HASH = 132
MASTERING_DISPLAY = 137
CONTENT_LIGHT_LEVEL = 144


@dataclass
class BufferingPeriod:
    """SEI.h:157 SEIBufferingPeriod (single NAL-HRD CPB, 24-bit delays)."""
    sps_id: int = 0
    initial_cpb_removal_delay: int = 90000
    initial_cpb_removal_offset: int = 0

    def write(self, w: BitWriter) -> None:
        w.ue(self.sps_id)
        w.flag(0)                     # irap_cpb_params_present_flag
        w.flag(0)                     # concatenation_flag
        w.write(0, 24)                # au_cpb_removal_delay_delta_minus1
        w.write(self.initial_cpb_removal_delay, 24)
        w.write(self.initial_cpb_removal_offset, 24)

    @classmethod
    def parse(cls, r: BitReader) -> "BufferingPeriod":
        sps_id = r.ue()
        assert r.flag() == 0 and r.flag() == 0
        r.read(24)
        return cls(sps_id, r.read(24), r.read(24))


@dataclass
class PictureTiming:
    """SEI.h:187 SEIPictureTiming, frame-field info only (no CPB HRD)."""
    pic_struct: int = 0               # 0 = progressive frame
    source_scan_type: int = 1         # 1 = progressive
    duplicate_flag: int = 0

    def write(self, w: BitWriter) -> None:
        w.write(self.pic_struct, 4)
        w.write(self.source_scan_type, 2)
        w.flag(self.duplicate_flag)

    @classmethod
    def parse(cls, r: BitReader) -> "PictureTiming":
        return cls(r.read(4), r.read(2), r.flag())


@dataclass
class UserDataUnregistered:
    """SEI.h user data unregistered: 16-byte UUID + payload bytes."""
    uuid: bytes = b"\x00" * 16
    data: bytes = b""

    def write(self, w: BitWriter) -> None:
        assert len(self.uuid) == 16
        for b_ in self.uuid + self.data:
            w.write(b_, 8)

    @classmethod
    def parse(cls, r: BitReader, size: int) -> "UserDataUnregistered":
        uuid = bytes(r.read(8) for _ in range(16))
        data = bytes(r.read(8) for _ in range(size - 16))
        return cls(uuid, data)


@dataclass
class RecoveryPoint:
    """SEI.h:235 SEIRecoveryPoint — decoder may join at this AU and be
    fully refreshed recovery_poc_cnt pictures later."""
    recovery_poc_cnt: int = 0
    exact_match: bool = True
    broken_link: bool = False

    def write(self, w: BitWriter) -> None:
        w.se(self.recovery_poc_cnt)
        w.flag(1 if self.exact_match else 0)
        w.flag(1 if self.broken_link else 0)

    @classmethod
    def parse(cls, r: BitReader) -> "RecoveryPoint":
        return cls(r.se(), bool(r.flag()), bool(r.flag()))


@dataclass
class ToneMappingInfo:
    """SEI.h tone mapping info, models 0-3 (linear/sigmoid/user map)."""
    tone_map_id: int = 0
    cancel: bool = False
    persistence: bool = True
    coded_bit_depth: int = 8
    target_bit_depth: int = 8
    model_id: int = 0
    min_value: int = 0                # model 0
    max_value: int = 255
    sigmoid_midpoint: int = 128       # model 1
    sigmoid_width: int = 64
    start_of_coded_interval: list = field(default_factory=list)  # model 2
    coded_pivot: list = field(default_factory=list)              # model 3
    target_pivot: list = field(default_factory=list)

    def write(self, w: BitWriter) -> None:
        w.ue(self.tone_map_id)
        w.flag(1 if self.cancel else 0)
        if self.cancel:
            return
        w.flag(1 if self.persistence else 0)
        w.ue(self.coded_bit_depth)
        w.ue(self.target_bit_depth)
        w.ue(self.model_id)
        if self.model_id == 0:
            w.write(self.min_value, 32)
            w.write(self.max_value, 32)
        elif self.model_id == 1:
            w.write(self.sigmoid_midpoint, 32)
            w.write(self.sigmoid_width, 32)
        elif self.model_id == 2:
            for v in self.start_of_coded_interval:
                w.write(v, (self.coded_bit_depth + 7) & ~7)
        elif self.model_id == 3:
            w.write(len(self.coded_pivot), 16)
            nb = (self.coded_bit_depth + 7) & ~7
            tb = (self.target_bit_depth + 7) & ~7
            for c, t in zip(self.coded_pivot, self.target_pivot):
                w.write(c, nb)
                w.write(t, tb)

    @classmethod
    def parse(cls, r: BitReader) -> "ToneMappingInfo":
        m = cls(tone_map_id=r.ue(), cancel=bool(r.flag()))
        if m.cancel:
            return m
        m.persistence = bool(r.flag())
        m.coded_bit_depth = r.ue()
        m.target_bit_depth = r.ue()
        m.model_id = r.ue()
        if m.model_id == 0:
            m.min_value, m.max_value = r.read(32), r.read(32)
        elif m.model_id == 1:
            m.sigmoid_midpoint, m.sigmoid_width = r.read(32), r.read(32)
        elif m.model_id == 2:
            nb = (m.coded_bit_depth + 7) & ~7
            n = (1 << m.target_bit_depth)
            m.start_of_coded_interval = [r.read(nb) for _ in range(n)]
        elif m.model_id == 3:
            n = r.read(16)
            nb = (m.coded_bit_depth + 7) & ~7
            tb = (m.target_bit_depth + 7) & ~7
            for _ in range(n):
                m.coded_pivot.append(r.read(nb))
                m.target_pivot.append(r.read(tb))
        return m


@dataclass
class FramePacking:
    """SEI.h frame packing arrangement (stereo 3D signalling)."""
    arrangement_id: int = 0
    cancel: bool = False
    arrangement_type: int = 3         # 3 = side-by-side, 4 = top-bottom
    quincunx: bool = False
    content_interpretation: int = 1   # 1 = left first

    def write(self, w: BitWriter) -> None:
        w.ue(self.arrangement_id)
        w.flag(1 if self.cancel else 0)
        if self.cancel:
            return
        w.write(self.arrangement_type, 7)
        w.flag(1 if self.quincunx else 0)
        w.write(self.content_interpretation, 6)
        for _ in range(6):            # spatial flipping/grid flags off
            w.flag(0)
        w.write(0, 8)                 # frame0_grid_position / reserved
        w.flag(0)                     # persistence
        w.flag(0)                     # upsampled_aspect_ratio

    @classmethod
    def parse(cls, r: BitReader) -> "FramePacking":
        m = cls(arrangement_id=r.ue(), cancel=bool(r.flag()))
        if m.cancel:
            return m
        m.arrangement_type = r.read(7)
        m.quincunx = bool(r.flag())
        m.content_interpretation = r.read(6)
        for _ in range(6):
            r.flag()
        r.read(8)
        r.flag()
        r.flag()
        return m


@dataclass
class ActiveParameterSets:
    """SEI.h active parameter sets."""
    vps_id: int = 0
    full_random_access: bool = True
    no_param_set_update: bool = True
    sps_ids: list = field(default_factory=lambda: [0])

    def write(self, w: BitWriter) -> None:
        w.write(self.vps_id, 4)
        w.flag(1 if self.full_random_access else 0)
        w.flag(1 if self.no_param_set_update else 0)
        w.ue(len(self.sps_ids) - 1)
        for s in self.sps_ids:
            w.ue(s)

    @classmethod
    def parse(cls, r: BitReader) -> "ActiveParameterSets":
        m = cls(vps_id=r.read(4), full_random_access=bool(r.flag()),
                no_param_set_update=bool(r.flag()), sps_ids=[])
        n = r.ue() + 1
        m.sps_ids = [r.ue() for _ in range(n)]
        return m


@dataclass
class MasteringDisplay:
    """SEI.h:~ mastering display colour volume (SMPTE ST 2086)."""
    primaries: tuple = ((35400, 14600), (8500, 39850), (6550, 2300))
    white_point: tuple = (15635, 16450)
    max_luminance: int = 10000000
    min_luminance: int = 50

    def write(self, w: BitWriter) -> None:
        for gx, gy in self.primaries:
            w.write(gx, 16)
            w.write(gy, 16)
        w.write(self.white_point[0], 16)
        w.write(self.white_point[1], 16)
        w.write(self.max_luminance, 32)
        w.write(self.min_luminance, 32)

    @classmethod
    def parse(cls, r: BitReader) -> "MasteringDisplay":
        prim = tuple((r.read(16), r.read(16)) for _ in range(3))
        wp = (r.read(16), r.read(16))
        return cls(prim, wp, r.read(32), r.read(32))


@dataclass
class ContentLightLevel:
    """Content light level info (max content / max frame-average)."""
    max_content: int = 1000
    max_pic_average: int = 400

    def write(self, w: BitWriter) -> None:
        w.write(self.max_content, 16)
        w.write(self.max_pic_average, 16)

    @classmethod
    def parse(cls, r: BitReader) -> "ContentLightLevel":
        return cls(r.read(16), r.read(16))


_TYPES = {
    BUFFERING_PERIOD: BufferingPeriod,
    PICTURE_TIMING: PictureTiming,
    USER_DATA_UNREGISTERED: UserDataUnregistered,
    RECOVERY_POINT: RecoveryPoint,
    TONE_MAPPING_INFO: ToneMappingInfo,
    FRAME_PACKING: FramePacking,
    ACTIVE_PARAMETER_SETS: ActiveParameterSets,
    MASTERING_DISPLAY: MasteringDisplay,
    CONTENT_LIGHT_LEVEL: ContentLightLevel,
}
_TYPE_OF = {v: k for k, v in _TYPES.items()}


def _payload_bytes(msg) -> bytes:
    w = BitWriter()
    msg.write(w)
    if not w.byte_aligned():
        w.flag(1)                     # payload_bit_equal_to_one
        while not w.byte_aligned():
            w.flag(0)
        return w.data()
    return w.data()


def write_sei_rbsp(messages: list) -> bytes:
    """SEI RBSP: ff-escaped type/size per message + trailing bits
    (spec 7.3.5; SEIwrite.cpp writeSEImessages)."""
    w = BitWriter()
    for msg in messages:
        ptype = _TYPE_OF[type(msg)]
        payload = _payload_bytes(msg)
        t, s = ptype, len(payload)
        while t >= 255:
            w.write(255, 8)
            t -= 255
        w.write(t, 8)
        while s >= 255:
            w.write(255, 8)
            s -= 255
        w.write(s, 8)
        for b_ in payload:
            w.write(b_, 8)
    w.rbsp_trailing_bits()
    return w.data()


def sei_nal(messages: list, prefix: bool = True) -> bytes:
    return bs.nal_unit(bs.NAL_PREFIX_SEI if prefix else bs.NAL_SUFFIX_SEI,
                       write_sei_rbsp(messages))


def parse_sei_rbsp(rbsp: bytes) -> list:
    """Parse an SEI RBSP into message objects; unknown payload types are
    returned as (ptype, raw_bytes) tuples (SEIread.cpp behavior of
    skipping unrecognized payloads, but kept for inspection)."""
    out = []
    data = rbsp
    pos = 0
    while pos < len(data) and data[pos:pos + 1] != b"\x80":
        ptype = 0
        while data[pos] == 255:
            ptype += 255
            pos += 1
        ptype += data[pos]
        pos += 1
        size = 0
        while data[pos] == 255:
            size += 255
            pos += 1
        size += data[pos]
        pos += 1
        payload = data[pos:pos + size]
        pos += size
        cls = _TYPES.get(ptype)
        if cls is None:
            out.append((ptype, payload))
            continue
        r = BitReader(payload)
        if cls is UserDataUnregistered:
            out.append(cls.parse(r, size))
        else:
            out.append(cls.parse(r))
    return out
