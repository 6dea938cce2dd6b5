"""DICOM networking: C-ECHO / C-FIND / C-MOVE client (PACS query/retrieve).

Reference: invesalius/net/dicom.py ``DicomNet`` — C-ECHO :42, C-FIND
patient query :46, C-MOVE retrieve :135 via GDCM's network classes.

GDCM isn't in this environment; this is a minimal native DIMSE
implementation over TCP: A-ASSOCIATE-RQ/AC, C-ECHO-RQ/RSP on the
Verification SOP class.  C-FIND/C-MOVE negotiate but are gated behind the
same association layer (full DIMSE message encoding reuses the writer in
invesalius3_tpu.io.dicom).  Enough to verify a PACS is alive and to keep
the API surface; full query/retrieve lands with a conformance pass.
"""

from __future__ import annotations

import socket
import struct
from typing import Optional

VERIFICATION_SOP = "1.2.840.10008.1.1"
STUDY_ROOT_FIND = "1.2.840.10008.5.1.4.1.2.2.1"
IMPLICIT_VR_LE = "1.2.840.10008.1.2"


def _pdu(pdu_type: int, payload: bytes) -> bytes:
    return struct.pack(">BBI", pdu_type, 0, len(payload)) + payload


def _item(item_type: int, payload: bytes) -> bytes:
    return struct.pack(">BBH", item_type, 0, len(payload)) + payload


def _uid(s: str) -> bytes:
    b = s.encode("ascii")
    return b + (b"\x00" if len(b) % 2 else b"")


class DicomNet:
    """PACS client (reference DicomNet API surface)."""

    def __init__(self, host: str = "", port: int = 104,
                 aetitle_call: str = "ANYSCP", aetitle: str = "INVESALIUS"):
        self.host = host
        self.port = port
        self.aetitle_call = aetitle_call
        self.aetitle = aetitle

    def SetHost(self, host):  # reference-compatible setters
        self.host = host

    def SetPort(self, port):
        self.port = int(port)

    def SetAETitleCall(self, aetitle):
        self.aetitle_call = aetitle

    def SetAETitle(self, aetitle):
        self.aetitle = aetitle

    def _associate(self, sock: socket.socket, abstract_syntax: str) -> bool:
        app_context = _item(0x10, _uid("1.2.840.10008.3.1.1.1"))
        pres_context = _item(
            0x20,
            struct.pack(">BBBB", 1, 0, 0, 0)
            + _item(0x30, _uid(abstract_syntax))
            + _item(0x40, _uid(IMPLICIT_VR_LE)),
        )
        user_info = _item(0x50, _item(0x51, struct.pack(">I", 16384)))
        called = self.aetitle_call.ljust(16).encode("ascii")
        calling = self.aetitle.ljust(16).encode("ascii")
        payload = (
            struct.pack(">HH", 1, 0) + called + calling + b"\x00" * 32
            + app_context + pres_context + user_info
        )
        sock.sendall(_pdu(0x01, payload))
        head = _recv_exact(sock, 6)
        if head is None:
            return False
        (length,) = struct.unpack(">I", head[2:6])
        _recv_exact(sock, length)  # consume the full AC/RJ payload
        return head[0] == 0x02  # A-ASSOCIATE-AC

    def RunCEcho(self, timeout: float = 5.0) -> bool:
        """C-ECHO: associate on the Verification SOP class (reference
        dicom.py:42).  Returns True if the SCP accepts the association and
        answers the echo."""
        try:
            with socket.create_connection((self.host, self.port), timeout=timeout) as s:
                if not self._associate(s, VERIFICATION_SOP):
                    return False
                # C-ECHO-RQ command set (implicit VR LE group 0000)
                def el(tag_elem: int, vr_payload: bytes) -> bytes:
                    return struct.pack("<HHI", 0x0000, tag_elem, len(vr_payload)) + vr_payload

                cmd = b"".join([
                    el(0x0002, _uid(VERIFICATION_SOP)),
                    el(0x0100, struct.pack("<H", 0x0030)),  # C-ECHO-RQ
                    el(0x0110, struct.pack("<H", 1)),  # message id
                    el(0x0800, struct.pack("<H", 0x0101)),  # no dataset
                ])
                group_len = el(0x0000, struct.pack("<I", len(cmd)))
                full = group_len + cmd
                pdv = struct.pack(">IB", len(full) + 2, 1) + b"\x03" + full
                s.sendall(_pdu(0x04, pdv))
                rsp = s.recv(6)
                # release
                s.sendall(_pdu(0x05, b"\x00" * 4))
                return len(rsp) == 6 and rsp[0] == 0x04
        except OSError:
            return False

    def RunCFind(self, patient_name: str = "*", level: str = "STUDY",
                 timeout: float = 10.0):
        """Study-root C-FIND (reference dicom.py:46): returns a list of
        matched identifier dicts ({tag_name: value})."""
        results = []
        try:
            with socket.create_connection((self.host, self.port), timeout=timeout) as s:
                if not self._associate(s, STUDY_ROOT_FIND):
                    return results

                def el(elem: int, payload: bytes, group: int = 0x0000) -> bytes:
                    return struct.pack("<HHI", group, elem, len(payload)) + payload

                # command set
                cmd = b"".join([
                    el(0x0002, _uid(STUDY_ROOT_FIND)),
                    el(0x0100, struct.pack("<H", 0x0020)),  # C-FIND-RQ
                    el(0x0110, struct.pack("<H", 1)),
                    el(0x0700, struct.pack("<H", 0)),  # priority MEDIUM
                    el(0x0800, struct.pack("<H", 0x0000)),  # dataset follows
                ])
                cmd = el(0x0000, struct.pack("<I", len(cmd))) + cmd

                # identifier dataset (implicit VR LE)
                def ds_el(group, elem, text):
                    b = text.encode("ascii")
                    if len(b) % 2:
                        b += b" "
                    return struct.pack("<HHI", group, elem, len(b)) + b

                ident = b"".join([
                    ds_el(0x0008, 0x0052, level),  # QueryRetrieveLevel
                    ds_el(0x0010, 0x0010, patient_name),
                    ds_el(0x0010, 0x0020, ""),  # PatientID (return)
                    ds_el(0x0020, 0x000D, ""),  # StudyInstanceUID (return)
                    ds_el(0x0008, 0x1030, ""),  # StudyDescription (return)
                ])
                s.sendall(_pdu(0x04, struct.pack(">IB", len(cmd) + 2, 1) + b"\x03" + cmd))
                s.sendall(_pdu(0x04, struct.pack(">IB", len(ident) + 2, 1) + b"\x02" + ident))

                # read response PDUs until final status
                buf = b""
                while True:
                    head = _recv_exact(s, 6)
                    if head is None or head[0] != 0x04:
                        break
                    (length,) = struct.unpack(">I", head[2:6])
                    payload = _recv_exact(s, length)
                    if payload is None:
                        break
                    pos = 0
                    pending = False
                    while pos + 6 <= len(payload):
                        (pdv_len,) = struct.unpack(">I", payload[pos : pos + 4])
                        mch = payload[pos + 5]
                        data = payload[pos + 6 : pos + 4 + pdv_len]
                        pos += 4 + pdv_len
                        if mch & 0x01:  # command
                            status = _read_implicit_tag(data, 0x0000, 0x0900)
                            if status is not None and status in (0xFF00, 0xFF01):
                                pending = True
                            elif status is not None:
                                s.sendall(_pdu(0x05, b"\x00" * 4))
                                return results
                        else:  # dataset (a match)
                            from invesalius3_tpu.io.dicom import _parse_elements

                            tags, _, _ = _parse_elements(data, 0, False, False)
                            results.append(tags)
                    del pending
        except OSError:
            pass
        return results

    def RunCMove(self, study_uid: str, dest_folder):
        raise NotImplementedError(
            "C-MOVE retrieve requires a local storage SCP listener; "
            "lands with the DIMSE conformance pass")


def _recv_exact(sock: socket.socket, n: int):
    buf = b""
    while len(buf) < n:
        chunk = sock.recv(n - len(buf))
        if not chunk:
            return None
        buf += chunk
    return buf


def _read_implicit_tag(data: bytes, group: int, elem: int):
    pos = 0
    while pos + 8 <= len(data):
        g, e, length = struct.unpack_from("<HHI", data, pos)
        pos += 8
        if (g, e) == (group, elem):
            if length >= 2:
                return struct.unpack_from("<H", data, pos)[0]
            return None
        pos += length
    return None
