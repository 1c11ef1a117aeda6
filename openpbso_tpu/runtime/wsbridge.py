"""WebSocket bridge + browser demo client for the audio server.

The reference's interaction surface is a native GUI window
(real_time_modal_sound.cpp / ModalViewer); a TPU deployment is headless, so
this module serves the same engine to any browser:

- ``GET /``            -> a self-contained demo page (WebAudio playback,
                          hit buttons, listener sliders)
- ``GET /ws`` (Upgrade) -> a WebSocket: binary frames carry float32 PCM
  blocks device->browser; text frames carry the same JSON command surface
  as runtime/server.py (hit / listener / sustain / stats / ...), dispatched
  through the exact same AudioServer._dispatch.

The WebSocket framing is implemented directly on the socket (RFC 6455:
handshake = SHA-1 accept key; server frames unmasked, client frames masked)
— no third-party dependency, matching the zero-install constraint.
"""
from __future__ import annotations

import base64
import hashlib
import json
import socket
import struct
import threading

import numpy as np

from ..config import SAMPLE_RATE
from .server import AudioServer

_WS_GUID = "258EAFA5-E914-47DA-95CA-C5AB0DC85B11"

OP_TEXT, OP_BINARY, OP_CLOSE, OP_PING, OP_PONG = 0x1, 0x2, 0x8, 0x9, 0xA


def ws_accept_key(client_key: str) -> str:
    digest = hashlib.sha1((client_key + _WS_GUID).encode()).digest()
    return base64.b64encode(digest).decode()


def encode_frame(opcode: int, payload: bytes) -> bytes:
    """Server->client frame (FIN set, never masked)."""
    head = bytes([0x80 | opcode])
    n = len(payload)
    if n < 126:
        head += bytes([n])
    elif n < (1 << 16):
        head += bytes([126]) + struct.pack(">H", n)
    else:
        head += bytes([127]) + struct.pack(">Q", n)
    return head + payload


class _FrameReader:
    """Incremental client->server frame parser (handles masking).

    Client frames carry only JSON commands, so payloads are capped at
    ``max_len`` — a declared length beyond it is a protocol violation,
    not a reason to allocate gigabytes.
    """

    def __init__(self, conn: socket.socket, max_len: int = 1 << 20):
        self._conn = conn
        self._buf = b""
        self._max_len = max_len

    def _need(self, n: int) -> bytes:
        while len(self._buf) < n:
            chunk = self._conn.recv(65536)
            if not chunk:
                raise ConnectionError("websocket closed")
            self._buf += chunk
        out, self._buf = self._buf[:n], self._buf[n:]
        return out

    def read_frame(self) -> tuple[int, bytes]:
        """Returns (opcode, unmasked payload) of the next complete frame."""
        b0, b1 = self._need(2)
        opcode = b0 & 0x0F
        masked = bool(b1 & 0x80)
        n = b1 & 0x7F
        if n == 126:
            (n,) = struct.unpack(">H", self._need(2))
        elif n == 127:
            (n,) = struct.unpack(">Q", self._need(8))
        if n > self._max_len:
            raise ConnectionError(f"websocket frame too large ({n} bytes)")
        mask = self._need(4) if masked else b"\x00" * 4
        payload = self._need(n)
        if masked:
            payload = (np.frombuffer(payload, np.uint8)
                       ^ np.resize(np.frombuffer(mask, np.uint8),
                                   n)).tobytes() if n else b""
        return opcode, payload


class _WSSink:
    """Audio sink writing PCM as binary websocket frames."""

    def __init__(self, conn: socket.socket, send_timeout: float = 5.0):
        self._conn = conn
        conn.settimeout(send_timeout)
        self._lock = threading.Lock()
        self.closed = False

    def _send(self, frame: bytes) -> bool:
        try:
            with self._lock:
                self._conn.sendall(frame)
            return True
        except (OSError, socket.timeout):
            self.closed = True
            return False

    def write(self, block: np.ndarray) -> bool:
        data = np.ascontiguousarray(block, "<f4").tobytes()
        return self._send(encode_frame(OP_BINARY, data))

    def send_json(self, obj) -> None:
        self._send(encode_frame(OP_TEXT, json.dumps(obj).encode()))

    def pong(self, payload: bytes) -> None:
        self._send(encode_frame(OP_PONG, payload))

    def close(self) -> None:
        self._send(encode_frame(OP_CLOSE, b""))


class WebSocketAudioServer(AudioServer):
    """AudioServer speaking HTTP/WebSocket instead of raw framing.

    Reuses AudioServer's engine lifecycle and command dispatch; only the
    transport differs. ``GET /`` serves the demo page.
    """

    def _handle(self, conn: socket.socket) -> None:
        conn.settimeout(10.0)
        req = b""
        while b"\r\n\r\n" not in req:
            chunk = conn.recv(8192)
            if not chunk:
                return
            req += chunk
        head = req.split(b"\r\n\r\n", 1)[0].decode("latin-1")
        lines = head.split("\r\n")
        parts = lines[0].split(" ")
        if parts[0] != "GET" or len(parts) < 2:
            conn.sendall(b"HTTP/1.1 400 Bad Request\r\n"
                         b"Content-Length: 0\r\nConnection: close\r\n\r\n")
            return
        path = parts[1]
        headers = {}
        for ln in lines[1:]:
            if ":" in ln:
                k, v = ln.split(":", 1)
                headers[k.strip().lower()] = v.strip()

        if headers.get("upgrade", "").lower() != "websocket":
            body = DEMO_PAGE.encode()
            status = b"200 OK" if path == "/" else b"404 Not Found"
            if path != "/":
                body = b"openpbso-tpu: connect a WebSocket at /ws"
            conn.sendall(b"HTTP/1.1 " + status +
                         b"\r\nContent-Type: text/html; charset=utf-8"
                         b"\r\nContent-Length: " +
                         str(len(body)).encode() +
                         b"\r\nConnection: close\r\n\r\n" + body)
            return

        key = headers.get("sec-websocket-key", "")
        conn.sendall(
            b"HTTP/1.1 101 Switching Protocols\r\n"
            b"Upgrade: websocket\r\nConnection: Upgrade\r\n"
            b"Sec-WebSocket-Accept: " + ws_accept_key(key).encode() +
            b"\r\n\r\n")

        from .engine import StreamingEngine
        session = self._make_session()
        sink = _WSSink(conn)
        sink.send_json({"hello": "openpbso-tpu",
                        "sample_rate": SAMPLE_RATE,
                        "channels": int(session.gains.shape[-1]),
                        "block_size": session.config.block_size,
                        "modes": int(session.bank.num_modes)})
        engine = StreamingEngine(session, sink, lookahead=self._lookahead)
        engine.start()
        reader = _FrameReader(conn)
        try:
            while not sink.closed and engine.healthy:
                try:
                    opcode, payload = reader.read_frame()
                except socket.timeout:
                    continue
                except ConnectionError:
                    break
                if opcode == OP_CLOSE:
                    break
                if opcode == OP_PING:
                    sink.pong(payload)
                    continue
                if opcode == OP_TEXT and payload.strip():
                    if self._dispatch(engine, sink, payload):
                        break
            if not engine.healthy and engine.error is not None:
                sink.send_json({"error": f"synthesis failed: "
                                         f"{engine.error!r}"})
        finally:
            # stop synthesis FIRST so no PCM frame follows the CLOSE frame
            engine.stop()
            sink.close()


DEMO_PAGE = """<!doctype html>
<html><head><meta charset="utf-8"><title>openpbso-tpu live demo</title>
<style>
 body{font-family:system-ui,sans-serif;background:#14161a;color:#dfe3ea;
      max-width:640px;margin:2rem auto;padding:0 1rem}
 button{font-size:1.05rem;padding:.5rem 1.1rem;margin:.25rem;border:0;
        border-radius:.5rem;background:#3b82f6;color:#fff;cursor:pointer}
 button:disabled{background:#444}
 input[type=range]{width:100%}
 #log{font-family:ui-monospace,monospace;font-size:.85rem;color:#9aa3b2;
      white-space:pre-line;margin-top:1rem}
 .bar{height:10px;background:#222;border-radius:5px;overflow:hidden}
 .bar>div{height:100%;width:0;background:#22c55e}
</style></head><body>
<h2>openpbso-tpu &mdash; live modal synthesis</h2>
<p>PCM streams from the synthesis server over a WebSocket and plays via
WebAudio. Strike the object, drag the listener.</p>
<button id="start">connect + start audio</button>
<button id="hit" disabled>hit</button>
<button id="hitg" disabled>soft hit</button>
<div><label>listener azimuth <input id="az" type="range" min="0" max="628"
 value="157" disabled></label></div>
<div class="bar"><div id="meter"></div></div>
<div id="log"></div>
<script>
let ws=null,ctx=null,info=null,t=0,blocks=0,peak=0;
const log=m=>{document.getElementById('log').textContent=
  m+"\\n"+document.getElementById('log').textContent.slice(0,600)};
window.state={blocks:0,peak:0,connected:false};
function play(f32){
  const ch=info.channels,n=f32.length/ch;
  const buf=ctx.createBuffer(ch,n,info.sample_rate);
  for(let c=0;c<ch;c++){const d=buf.getChannelData(c);
    for(let i=0;i<n;i++)d[i]=f32[i*ch+c];}
  const src=ctx.createBufferSource();src.buffer=buf;src.connect(ctx.destination);
  if(t<ctx.currentTime)t=ctx.currentTime+0.05;
  src.start(t);t+=n/info.sample_rate;
}
document.getElementById('start').onclick=async()=>{
  ctx=new AudioContext();await ctx.resume();
  ws=new WebSocket(`ws://${location.host}/ws`);
  ws.binaryType='arraybuffer';
  ws.onmessage=ev=>{
    if(typeof ev.data==='string'){
      const m=JSON.parse(ev.data);
      if(m.hello){info=m;window.state.connected=true;
        log('connected: '+ev.data);
        for(const id of['hit','hitg','az'])
          document.getElementById(id).disabled=false;
      } else log('server: '+ev.data);
      return;}
    const f32=new Float32Array(ev.data);
    blocks++;window.state.blocks=blocks;
    let p=0;for(const v of f32)p=Math.max(p,Math.abs(v));
    peak=Math.max(peak,p);window.state.peak=peak;
    document.getElementById('meter').style.width=
      Math.min(100,p*300)+'%';
    play(f32);
  };
  ws.onclose=()=>{window.state.connected=false;log('closed');};
};
const send=o=>ws&&ws.readyState===1&&ws.send(JSON.stringify(o));
document.getElementById('hit').onclick=()=>send({cmd:'hit',obj:0,vertex:3});
document.getElementById('hitg').onclick=()=>send(
  {cmd:'hit',obj:0,vertex:3,kind:'gaussian',width_us:400});
document.getElementById('az').oninput=e=>{const a=e.target.value/100;
  send({cmd:'listener',pos:[Math.cos(a),0.4,Math.sin(a)]});};
</script></body></html>
"""
