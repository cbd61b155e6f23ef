// JS wrapper over the WebAssembly build of the blingfire_tpu runtime,
// mirroring the reference wasm/blingfire_wrapper.js surface (GetVersion,
// TextToWords, TextToSentences, LoadModel, FreeModel, TextToIds, ...).
//
// Build blingfire_tpu.js/.wasm with the sibling Makefile (emscripten),
// then:
//   import createBlingFireTpu from './blingfire_tpu.js';
//   import { BlingFireTpu } from './blingfire_tpu_wrapper.mjs';
//   const bf = new BlingFireTpu(await createBlingFireTpu());

const MAX_OUT_BYTES = 1 << 20;

export class BlingFireTpu {
  constructor(module) {
    this.m = module;
    // handle -> malloc'd model-image pointer (the runtime reads the image
    // in place, so the bytes must stay alive until FreeModel)
    this.modelMem = new Map();
  }

  GetVersion() {
    return this.m._GetBlingFireTokVersion();
  }

  // -- internal helpers ------------------------------------------------------

  _withUtf8In(s, fn) {
    const m = this.m;
    const len = m.lengthBytesUTF8(s);
    const inPtr = m._malloc(len + 1); // +1: runtime expects NUL-terminated
    m.stringToUTF8(s, inPtr, len + 1);
    try {
      return fn(inPtr, len);
    } finally {
      m._free(inPtr);
    }
  }

  _textCall(s, rawFn) {
    // shared shape of TextToWords / TextToSentences (+WithModel variants)
    const m = this.m;
    return this._withUtf8In(s, (inPtr, len) => {
      const outPtr = m._malloc(MAX_OUT_BYTES);
      try {
        const actual = rawFn(inPtr, len, outPtr, MAX_OUT_BYTES);
        if (actual <= 0 || actual > MAX_OUT_BYTES) return null;
        return m.UTF8ToString(outPtr);
      } finally {
        m._free(outPtr);
      }
    });
  }

  // -- word / sentence breaking ----------------------------------------------

  TextToWords(s) {
    return this._textCall(s, (i, n, o, mx) => this.m._TextToWords(i, n, o, mx));
  }

  TextToSentences(s) {
    return this._textCall(s, (i, n, o, mx) => this.m._TextToSentences(i, n, o, mx));
  }

  TextToWordsWithModel(handle, s) {
    return this._textCall(s, (i, n, o, mx) =>
      this.m._TextToWordsWithModel(i, n, o, mx, handle));
  }

  TextToSentencesWithModel(handle, s) {
    return this._textCall(s, (i, n, o, mx) =>
      this.m._TextToSentencesWithModel(i, n, o, mx, handle));
  }

  NormalizeSpaces(s, spaceCode = 0x20) {
    return this._textCall(s, (i, n, o, mx) =>
      this.m._NormalizeSpaces(i, n, o, mx, spaceCode));
  }

  // -- model lifecycle -------------------------------------------------------

  // bytes: Uint8Array of a model image (e.g. fetched gpt2.bin)
  LoadModelBytes(bytes) {
    const m = this.m;
    const mem = m._malloc(bytes.byteLength);
    m.HEAPU8.set(bytes, mem);
    const h = m._SetModel(mem, bytes.byteLength);
    if (!h) {
      m._free(mem);
      return 0;
    }
    this.modelMem.set(h, mem);
    return h;
  }

  async LoadModel(url) {
    const resp = await fetch(url);
    const bytes = new Uint8Array(await resp.arrayBuffer());
    return this.LoadModelBytes(bytes);
  }

  FreeModel(handle) {
    this.m._FreeModel(handle);
    const mem = this.modelMem.get(handle);
    if (mem !== undefined) {
      this.m._free(mem);
      this.modelMem.delete(handle);
    }
  }

  SetNoDummyPrefix(handle, flag) {
    return this.m._SetNoDummyPrefix(handle, flag ? 1 : 0);
  }

  // -- ids -------------------------------------------------------------------

  TextToIds(handle, s, maxLen, unk = 0) {
    const m = this.m;
    return this._withUtf8In(s, (inPtr, len) => {
      const idsPtr = m._malloc(maxLen * 4);
      try {
        const count = m._TextToIds(handle, inPtr, len, idsPtr, maxLen, unk);
        const n = Math.min(count, maxLen);
        const ids = Array.from(m.HEAP32.subarray(idsPtr >> 2, (idsPtr >> 2) + n));
        return ids;
      } finally {
        m._free(idsPtr);
      }
    });
  }

  TextToIdsWithOffsets(handle, s, maxLen, unk = 0) {
    const m = this.m;
    return this._withUtf8In(s, (inPtr, len) => {
      const idsPtr = m._malloc(maxLen * 4);
      const stPtr = m._malloc(maxLen * 4);
      const enPtr = m._malloc(maxLen * 4);
      try {
        const count = m._TextToIdsWithOffsets(
          handle, inPtr, len, idsPtr, stPtr, enPtr, maxLen, unk);
        const n = Math.min(count, maxLen);
        const take = (p) => Array.from(m.HEAP32.subarray(p >> 2, (p >> 2) + n));
        return { ids: take(idsPtr), starts: take(stPtr), ends: take(enPtr) };
      } finally {
        m._free(idsPtr);
        m._free(stPtr);
        m._free(enPtr);
      }
    });
  }

  IdsToText(handle, ids, skipSpecialTokens = true) {
    const m = this.m;
    const idsPtr = m._malloc(ids.length * 4);
    m.HEAP32.set(ids, idsPtr >> 2);
    const outPtr = m._malloc(MAX_OUT_BYTES);
    try {
      const actual = m._IdsToText(
        handle, idsPtr, ids.length, outPtr, MAX_OUT_BYTES, skipSpecialTokens ? 1 : 0);
      if (actual <= 0 || actual > MAX_OUT_BYTES) return null;
      return m.UTF8ToString(outPtr);
    } finally {
      m._free(idsPtr);
      m._free(outPtr);
    }
  }

  // -- hyphenation / hashing -------------------------------------------------

  WordHyphenationWithModel(handle, s, hyphen = 0x2d) {
    return this._textCall(s, (i, n, o, mx) =>
      this.m._WordHyphenationWithModel(i, n, o, mx, handle, hyphen));
  }

  TextToHashes(s, wordNGrams, bucketSize = 10000000) {
    const m = this.m;
    return this._withUtf8In(s, (inPtr, len) => {
      // upper bound: one hash per word per ngram order
      const maxOut = (len + 1) * wordNGrams;
      const outPtr = m._malloc(maxOut * 4);
      try {
        const count = m._TextToHashes(inPtr, len, outPtr, maxOut, wordNGrams, bucketSize);
        if (count < 0) return null;
        const n = Math.min(count, maxOut);
        return Array.from(m.HEAP32.subarray(outPtr >> 2, (outPtr >> 2) + n));
      } finally {
        m._free(outPtr);
      }
    });
  }
}
