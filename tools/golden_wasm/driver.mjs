// Headless driver for the reference WASM stretch engine (golden renders).
//
// Runs under Node (>=18).  The reference module registers its AudioWorklet
// processor whenever AudioWorkletProcessor/registerProcessor exist
// (reference: app/SignalsmithStretch.mjs:969-972), so we fake the worklet
// scope, capture the processor class, and drive its process() callback in
// 128-frame quanta exactly like the browser does.
//
// Usage: node driver.mjs <config.json>
//   config = {
//     reference: "/root/reference/app/SignalsmithStretch.mjs",
//     sampleRate: 44100, channels: 1,
//     inputRaw: "in.f32",    // deinterleaved planes, float32
//     inputFrames: 123456,
//     outputRaw: "out.f32",  // deinterleaved planes written here
//     outputFrames: 65536,
//     configure: {blockMs: 120, intervalMs: 30, splitComputation: true},
//     schedule: {active: true, input: 0, output: 0, rate: 0.5,
//                semitones: 0, tonalityHz: 8000, formantSemitones: 0,
//                formantCompensation: false, formantBaseHz: 0}
//   }
import fs from "node:fs";

const cfg = JSON.parse(fs.readFileSync(process.argv[2], "utf8"));
const QUANTUM = 128;

globalThis.sampleRate = cfg.sampleRate;
globalThis.currentTime = 0;

let readyInfo = null;
const port = {
  onmessage: null,
  postMessage(msg) {
    if (Array.isArray(msg) && msg[0] === "ready") readyInfo = msg[1];
    // RPC replies {id, ok, ...} are ignored; we drive fire-and-forget.
  },
};

let ProcessorClass = null;
globalThis.AudioWorkletProcessor = class {
  constructor() { this.port = port; }
};
globalThis.registerProcessor = (_name, cls) => { ProcessorClass = cls; };

await import(cfg.reference);
if (!ProcessorClass) throw new Error("processor was not registered");

const proc = new ProcessorClass({});
// WASM instantiation is async; wait for the ready handshake.
for (let i = 0; i < 1000 && !readyInfo; i++) {
  await new Promise((r) => setTimeout(r, 10));
}
if (!readyInfo) throw new Error("wasm never became ready");

const send = (method, ...args) =>
  port.onmessage({ data: { id: 0, method, args } });

if (cfg.configure) send("configure", cfg.configure);

// load input planes
const raw = new Float32Array(fs.readFileSync(cfg.inputRaw).buffer);
const planes = [];
for (let c = 0; c < cfg.channels; c++)
  planes.push(raw.subarray(c * cfg.inputFrames, (c + 1) * cfg.inputFrames));
send("addBuffers", planes);

if (cfg.schedule) send("schedule", cfg.schedule);

const outPlanes = [];
for (let c = 0; c < cfg.channels; c++)
  outPlanes.push(new Float32Array(cfg.outputFrames));

let pos = 0;
while (pos < cfg.outputFrames) {
  globalThis.currentTime = pos / cfg.sampleRate;
  const quantum = [];
  for (let c = 0; c < cfg.channels; c++) quantum.push(new Float32Array(QUANTUM));
  proc.process([[]], [quantum]);
  const n = Math.min(QUANTUM, cfg.outputFrames - pos);
  for (let c = 0; c < cfg.channels; c++) outPlanes[c].set(quantum[c].subarray(0, n), pos);
  pos += n;
}

const out = new Float32Array(cfg.channels * cfg.outputFrames);
for (let c = 0; c < cfg.channels; c++) out.set(outPlanes[c], c * cfg.outputFrames);
fs.writeFileSync(cfg.outputRaw, Buffer.from(out.buffer));
console.error(`rendered ${cfg.outputFrames} frames`);
