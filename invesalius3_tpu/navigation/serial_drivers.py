"""Protocol-level serial tracker drivers with a recorded-bytes replay
transport.

The reference talks to Polhemus ISOTRAK/FASTRAK over pyserial (reference
invesalius/data/tracker_connection.py:264 ``PolhemusSerialConnection`` —
init command bytes per model, 0.03 s timeout; invesalius/data/
coordinates.py:467 ``PolhemusSerialCoord`` — poll with ``P``, read lines,
split fields that abut through their minus signs, cm -> mm scale, optional
dynamic-reference correction :622).  No tracker hardware exists in this
environment, so the protocol logic runs against a byte-transcript replay
transport — the same seam the DIMSE stack uses for its loopback tests —
and plugs into navigation/tracker.py unchanged.
"""

from __future__ import annotations

import json
import threading
import time
from pathlib import Path
from typing import List, Optional, Sequence, Tuple

import numpy as np

from invesalius3_tpu.navigation import vendor_coords
from invesalius3_tpu.navigation.tracker import TrackerConnection


class SerialTransport:
    """Byte-level transport boundary (what pyserial provides)."""

    def write(self, data: bytes) -> None:
        raise NotImplementedError

    def readlines(self) -> List[bytes]:
        raise NotImplementedError

    def close(self) -> None:
        pass


class PySerialTransport(SerialTransport):
    """Real COM-port transport (reference tracker_connection.py:276:
    ``serial.Serial(com_port, baudrate=baud_rate, timeout=0.03)``).
    Import is deferred — pyserial and hardware are absent in CI."""

    def __init__(self, com_port: str, baud_rate: int = 115200,
                 timeout: float = 0.03):
        import serial  # hardware-gated

        self._ser = serial.Serial(com_port, baudrate=baud_rate,
                                  timeout=timeout)

    def write(self, data: bytes) -> None:
        self._ser.write(data)

    def readlines(self) -> List[bytes]:
        return self._ser.readlines()

    def close(self) -> None:
        self._ser.close()


class ReplayTransport(SerialTransport):
    """Replays a recorded transcript: a list of ``{"write": hex,
    "lines": [hex, ...]}`` entries.  Each ``write`` must match the bytes
    the driver sends (protocol conformance is part of the assertion);
    ``readlines`` returns that entry's recorded response.  Poll entries
    cycle once the transcript is exhausted when ``loop=True`` (a tracker
    streaming the last pose forever)."""

    def __init__(self, transcript: Sequence[dict], loop: bool = True):
        self.transcript = list(transcript)
        self.loop = loop
        self.pos = 0
        self.writes: List[bytes] = []
        self._lock = threading.Lock()

    @classmethod
    def from_file(cls, path, **kw) -> "ReplayTransport":
        return cls(json.loads(Path(path).read_text()), **kw)

    def _entry(self) -> dict:
        if self.pos >= len(self.transcript):
            if not self.loop:
                raise EOFError("replay transcript exhausted")
            # loop over the trailing poll section (entries sharing the
            # final entry's command — b"P" for Polhemus, framed TX: for
            # NDI) so long-running navigation keeps a pose
            last = self.transcript[-1]["write"]
            polls = [e for e in self.transcript
                     if e["write"] == last] or self.transcript
            return polls[(self.pos - len(self.transcript)) % len(polls)]
        return self.transcript[self.pos]

    def write(self, data: bytes) -> None:
        with self._lock:
            e = self._entry()
            want = bytes.fromhex(e["write"])
            if data != want:
                raise AssertionError(
                    f"protocol mismatch at entry {self.pos}: driver wrote "
                    f"{data!r}, transcript expects {want!r}")
            self.writes.append(data)

    def readlines(self) -> List[bytes]:
        with self._lock:
            e = self._entry()
            self.pos += 1
            return [bytes.fromhex(h) for h in e.get("lines", [])]


class TranscriptRecorder(SerialTransport):
    """Wrap a real transport and capture the byte exchange into the
    replay format (run once against hardware, then test forever)."""

    def __init__(self, inner: SerialTransport):
        self.inner = inner
        self.entries: List[dict] = []

    def write(self, data: bytes) -> None:
        self.inner.write(data)
        self.entries.append({"write": data.hex(), "lines": []})

    def readlines(self) -> List[bytes]:
        lines = self.inner.readlines()
        if self.entries:
            self.entries[-1]["lines"] = [ln.hex() for ln in lines]
        return lines

    def save(self, path) -> None:
        Path(path).write_text(json.dumps(self.entries, indent=1))

    def close(self) -> None:
        self.inner.close()


class PolhemusSerialConnection(TrackerConnection):
    """ISOTRAK/FASTRAK serial driver (reference coordinates.py:467
    ``PolhemusSerialCoord`` + tracker_connection.py:264 init sequence).

    Sensor rows: 0 = probe (dynamic-referenced when ``ref_mode``),
    1 = reference sensor raw pose, 2 = coil (not provided on this link).
    """

    POLL = b"P"
    # "u": English units (cm), "F": ASCII output format, "Y": tip offset
    INIT = {"isotrak": [b"u", b"F", b"Y"], "fastrak": [b"u", b"F"]}

    def __init__(self, transport: SerialTransport, model: str = "isotrak",
                 ref_mode: bool = True):
        if model not in self.INIT:
            raise ValueError(f"unknown Polhemus model {model!r}")
        self.transport = transport
        self.model = model
        self.ref_mode = ref_mode
        self.stylus_button = False

    def connect(self) -> bool:
        for cmd in self.INIT[self.model]:
            self.transport.write(cmd)
            self.transport.readlines()  # drain any echo/ack
        return True

    def disconnect(self) -> None:
        self.transport.close()

    def get_coordinates(self) -> Tuple[np.ndarray, np.ndarray]:
        self.transport.write(self.POLL)
        lines = self.transport.readlines()
        coords = np.zeros((self.n_sensors, 6))
        flags = np.array([False, False, False])
        if not lines:
            return coords, flags
        probe = vendor_coords.parse_polhemus_serial(lines[0])
        if self.ref_mode and len(lines) > 1:
            reference = vendor_coords.parse_polhemus_serial(lines[1])
            coords[0] = vendor_coords.polhemus_dynamic_pose(probe, reference)
            coords[1] = reference
            flags[:2] = True
        else:
            coords[0] = probe
            flags[0] = True
        return coords, flags


# ---------------------------------------------------------------------------
# NDI Combined API (Polaris / Polaris P4 / Vega) over serial
# ---------------------------------------------------------------------------

def crc16_ndi(data: bytes) -> int:
    """CRC16 of the NDI Combined API (CRC-16/ARC: reflected poly 0xA001,
    init 0) — appended as 4 uppercase hex chars to every command and reply.
    The reference reaches Polaris through the closed pypolaris SWIG wrapper
    (tracker_connection.py:417); this build speaks the wire protocol the
    wrapper wraps, so the framing is implemented here."""
    crc = 0
    for b in data:
        crc ^= b
        for _ in range(8):
            crc = (crc >> 1) ^ 0xA001 if crc & 1 else crc >> 1
    return crc


def frame_ndi(cmd: bytes) -> bytes:
    """Frame a command: payload + CRC16 (4 hex) + CR."""
    return cmd + f"{crc16_ndi(cmd):04X}".encode() + b"\r"


def unframe_ndi(reply: bytes) -> bytes:
    """Strip CR + verify/remove the trailing CRC of a device reply."""
    reply = reply.rstrip(b"\r\n")
    body, crc_hex = reply[:-4], reply[-4:]
    want = f"{crc16_ndi(body):04X}".encode()
    if crc_hex.upper() != want:
        raise AssertionError(
            f"NDI reply CRC mismatch: got {crc_hex!r}, want {want!r}")
    return body


class NDIProtocolError(RuntimeError):
    pass


class NDIPolarisConnection(TrackerConnection):
    """Polaris driver speaking the NDI Combined API over serial
    (reference tracker_connection.py:386 ``PolarisTrackerConnection`` /
    coordinates.py:139 ``PolarisP4Coord`` — there via the closed pypolaris
    wrapper; here at protocol level so the replay transport can assert the
    exact byte exchange).

    Init sequence: ``INIT:`` -> ``PHSR:02`` (handles needing init) ->
    per handle ``PINIT:HH`` + ``PENA:HHD`` (dynamic) -> ``TSTART:``.
    Poll: ``TX:0001`` — per-handle ASCII transform records in the P4
    layout vendor_coords.parse_polaris_p4 decodes (four 6-char quaternion
    ints x1e-4, three 7-char translation ints x1e-2, 'MISSING' when the
    tool is out of view), LF-separated, then 4-hex system status.

    Handle order follows tool-load order like the reference wrapper:
    probe, reference, coil (coordinates.py:259 reads trck.probe/ref/objs).
    """

    POLL = b"TX:0001"

    def __init__(self, transport: SerialTransport, n_tools: int = 3):
        self.transport = transport
        self.n_tools = n_tools
        self.handles: List[str] = []

    # -- framing ----------------------------------------------------------
    def _exchange(self, cmd: bytes) -> bytes:
        self.transport.write(frame_ndi(cmd))
        reply = b"".join(self.transport.readlines())
        body = unframe_ndi(reply)
        if body.startswith(b"ERROR"):
            raise NDIProtocolError(
                f"device error {body[5:7].decode()} for command {cmd!r}")
        return body

    # -- lifecycle --------------------------------------------------------
    def connect(self) -> bool:
        if self._exchange(b"INIT:") != b"OKAY":
            return False
        phsr = self._exchange(b"PHSR:02").decode()
        n = int(phsr[:2], 16)
        self.handles = [phsr[2 + 5 * i:4 + 5 * i] for i in range(n)]
        for h in self.handles:
            self._exchange(f"PINIT:{h}".encode())
            self._exchange(f"PENA:{h}D".encode())
        self._exchange(b"TSTART:")
        return True

    def disconnect(self) -> None:
        try:
            self._exchange(b"TSTOP:")
        except Exception:
            pass
        self.transport.close()

    # -- polling ----------------------------------------------------------
    def get_coordinates(self) -> Tuple[np.ndarray, np.ndarray]:
        body = self._exchange(self.POLL).decode()
        records = body.split("\n")
        n = int(records[0][:2], 16)
        records[0] = records[0][2:]
        coords = np.zeros((self.n_sensors, 6))
        flags = np.array([False] * 3)
        for i, rec in enumerate(records[:n]):
            if i >= self.n_sensors:
                break
            pose = vendor_coords.parse_polaris_p4(rec)
            if pose is not None:
                coords[i] = pose
                if i < 3:
                    flags[i] = True
        return coords, flags


def make_polaris_transcript(frames: Sequence[Sequence[Optional[Tuple[
        Sequence[float], Sequence[float]]]]],
        handles: Sequence[str] = ("0A", "0B", "0C")) -> List[dict]:
    """Synthesize the byte transcript a Polaris would produce for the
    given frames — each frame is a per-tool list of ``(q_wxyz, t_mm)`` or
    ``None`` (tool out of view).  Replies carry real CRC16s so the driver's
    CRC verification is part of the replay assertion."""
    def reply(body: bytes) -> str:
        return (body + f"{crc16_ndi(body):04X}".encode() + b"\r").hex()

    handles = list(handles)[:len(frames[0])]
    phsr = f"{len(handles):02X}" + "".join(h + "001" for h in handles)
    entries = [
        {"write": frame_ndi(b"INIT:").hex(), "lines": [reply(b"OKAY")]},
        {"write": frame_ndi(b"PHSR:02").hex(),
         "lines": [reply(phsr.encode())]},
    ]
    for h in handles:
        entries.append({"write": frame_ndi(f"PINIT:{h}".encode()).hex(),
                        "lines": [reply(b"OKAY")]})
        entries.append({"write": frame_ndi(f"PENA:{h}D".encode()).hex(),
                        "lines": [reply(b"OKAY")]})
    entries.append({"write": frame_ndi(b"TSTART:").hex(),
                    "lines": [reply(b"OKAY")]})

    def tool_record(handle: str, tool) -> str:
        if tool is None:
            return handle + "MISSING" + "0" * 8 + "0" * 8
        q, t = tool
        qs = "".join(f"{int(round(v * 10000)):+06d}" for v in q)
        ts = "".join(f"{int(round(v * 100)):+07d}" for v in t)
        err, status, frame_no = "+00001", "0" * 8, "0" * 8
        return handle + qs + ts + err + status + frame_no

    for frame in frames:
        recs = [tool_record(h, tool) for h, tool in zip(handles, frame)]
        body = (f"{len(recs):02X}" + "\n".join(recs) + "\n0000").encode()
        entries.append({"write": frame_ndi(NDIPolarisConnection.POLL).hex(),
                        "lines": [reply(body)]})
    return entries


def make_isotrak_transcript(poses: Sequence[Tuple[Sequence[float],
                                                  Sequence[float]]],
                            model: str = "isotrak") -> List[dict]:
    """Synthesize a byte transcript an ISOTRAK would produce for the given
    (probe_cm_deg, reference_cm_deg) pose pairs — used by tests and the
    demo replay tracker.  Field layout per reference coordinates.py:467:
    station id then six fixed-width floats, negatives abutting the
    previous field."""
    entries = [{"write": c.hex(), "lines": []}
               for c in PolhemusSerialConnection.INIT[model]]

    def fmt(station: int, pose) -> bytes:
        txt = f"{station}"
        for v in pose:
            # negative values consume the separating space (full-width
            # columns on the real device) — the parser quirk the driver
            # must handle via the " -" re-split
            sep = "" if v < 0 else " "
            txt += f"{sep}{v:.2f}"
        return txt.encode() + b"\r\n"

    for probe, ref in poses:
        entries.append({
            "write": PolhemusSerialConnection.POLL.hex(),
            "lines": [fmt(1, probe).hex(), fmt(2, ref).hex()],
        })
    return entries
