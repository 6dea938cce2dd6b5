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
        head = sock.recv(6)
        if len(head) < 6:
            return False
        pdu_type = head[0]
        return pdu_type == 0x02  # A-ASSOCIATE-AC

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

    def RunCFind(self, patient_name: str = "*"):
        raise NotImplementedError(
            "C-FIND query lands with the DIMSE conformance pass; "
            "C-ECHO association works today")

    def RunCMove(self, study_uid: str, dest_folder):
        raise NotImplementedError(
            "C-MOVE retrieve lands with the DIMSE conformance pass")
