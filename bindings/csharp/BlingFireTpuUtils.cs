// C# P/Invoke binding for the blingfire_tpu native host runtime
// (libbtf_runtime.so).  Mirrors the surface of the reference binding
// (nuget/lib/BlingFireUtils.cs:19-236) so a consumer of the reference
// NuGet package can switch by changing only the DLL name.
//
// The native library exports the same C ABI as the reference
// blingfiretokdll (see blingfire_tpu/native/runtime.cpp, "C ABI" block),
// so every [DllImport] below resolves against symbols verified by
// tests/test_bindings.py.

using System;
using System.Collections.Generic;
using System.Runtime.InteropServices;
using System.Text;

namespace BlingFireTpu
{
    public static class BlingFireTpuUtils
    {
        // Name resolution: "btf_runtime" -> libbtf_runtime.so on Linux,
        // btf_runtime.dll on Windows (only Linux builds are produced here).
        const string NativeLib = "btf_runtime";

        // -- model lifecycle -------------------------------------------------

        [DllImport(NativeLib)]
        public static extern Int32 GetBlingFireTokVersion();

        [DllImport(NativeLib, EntryPoint = "LoadModel")]
        static extern UInt64 LoadModelRaw(byte[] modelName);

        public static UInt64 LoadModel(string modelName)
        {
            // native side takes a NUL-terminated UTF-8 path
            var bytes = Encoding.UTF8.GetBytes(modelName + char.MinValue);
            return LoadModelRaw(bytes);
        }

        [DllImport(NativeLib)]
        public static extern UInt64 SetModel(byte[] modelBytes, Int32 modelByteCount);

        [DllImport(NativeLib)]
        public static extern int FreeModel(UInt64 model);

        [DllImport(NativeLib)]
        public static extern int SetNoDummyPrefix(UInt64 model, bool fNoDummyPrefix);

        [DllImport(NativeLib, EntryPoint = "SetDefaultModels")]
        static extern int SetDefaultModelsRaw(UInt64 wbd, UInt64 sbd);

        // Unlike the reference dll (which compiles the default wbd/sbd data
        // into the binary as .cxx byte arrays), this runtime loads them from
        // files; call once before TextToWords/TextToSentences.  The handles
        // stay owned by the runtime until process exit.
        public static int SetDefaultModels(string wbdPath, string sbdPath)
        {
            return SetDefaultModelsRaw(LoadModel(wbdPath), LoadModel(sbdPath));
        }

        // -- sentence / word breaking (compiled-in default models) -----------

        [DllImport(NativeLib)]
        public static extern Int32 TextToSentences(byte[] inUtf8Str, Int32 inUtf8StrLen, byte[] outBuff, Int32 maxBuffSize);

        [DllImport(NativeLib)]
        public static extern Int32 TextToWords(byte[] inUtf8Str, Int32 inUtf8StrLen, byte[] outBuff, Int32 maxBuffSize);

        [DllImport(NativeLib)]
        public static extern Int32 TextToSentencesWithModel(byte[] inUtf8Str, Int32 inUtf8StrLen, byte[] outBuff, Int32 maxBuffSize, UInt64 model);

        [DllImport(NativeLib)]
        public static extern Int32 TextToWordsWithModel(byte[] inUtf8Str, Int32 inUtf8StrLen, byte[] outBuff, Int32 maxBuffSize, UInt64 model);

        [DllImport(NativeLib)]
        public static extern Int32 TextToSentencesWithOffsets(byte[] inUtf8Str, Int32 inUtf8StrLen, byte[] outBuff, int[] startOffsets, int[] endOffsets, Int32 maxBuffSize);

        [DllImport(NativeLib)]
        public static extern Int32 TextToWordsWithOffsets(byte[] inUtf8Str, Int32 inUtf8StrLen, byte[] outBuff, int[] startOffsets, int[] endOffsets, Int32 maxBuffSize);

        [DllImport(NativeLib)]
        public static extern Int32 TextToSentencesWithOffsetsWithModel(byte[] inUtf8Str, Int32 inUtf8StrLen, byte[] outBuff, int[] startOffsets, int[] endOffsets, Int32 maxBuffSize, UInt64 model);

        [DllImport(NativeLib)]
        public static extern Int32 TextToWordsWithOffsetsWithModel(byte[] inUtf8Str, Int32 inUtf8StrLen, byte[] outBuff, int[] startOffsets, int[] endOffsets, Int32 maxBuffSize, UInt64 model);

        // -- normalization / hashing / hyphenation ---------------------------

        [DllImport(NativeLib)]
        public static extern Int32 NormalizeSpaces(byte[] inUtf8Str, Int32 inUtf8StrLen, byte[] outBuff, Int32 maxBuffSize, Int32 utf32SpaceCode);

        [DllImport(NativeLib)]
        public static extern Int32 TextToHashes(byte[] inUtf8Str, Int32 inUtf8StrLen, int[] tokenIds, Int32 maxBuffSize, Int32 wordNGrams, Int32 bucketSize);

        [DllImport(NativeLib)]
        public static extern Int32 WordHyphenationWithModel(byte[] inUtf8Str, Int32 inUtf8StrLen, byte[] outBuff, Int32 maxBuffSize, UInt64 model, Int32 uHy);

        // -- ids -------------------------------------------------------------

        [DllImport(NativeLib)]
        public static extern int TextToIds(UInt64 model, byte[] inUtf8Str, Int32 inUtf8StrLen, int[] tokenIds, Int32 maxBuffSize, int unkId);

        [DllImport(NativeLib)]
        public static extern int TextToIdsWithOffsets(UInt64 model, byte[] inUtf8Str, Int32 inUtf8StrLen, int[] tokenIds, int[] startOffsets, int[] endOffsets, Int32 maxBuffSize, int unkId);

        [DllImport(NativeLib, EntryPoint = "IdsToText")]
        static extern int IdsToTextRaw(UInt64 model, int[] ids, Int32 idsCount, byte[] outBuff, Int32 maxBuffSize, bool skipSpecialTokens);

        public static string IdsToText(UInt64 model, int[] ids, bool skipSpecialTokens = true)
        {
            // two-pass: probe for the needed size, then fetch
            int needed = IdsToTextRaw(model, ids, ids.Length, null, 0, skipSpecialTokens);
            if (needed <= 0)
            {
                return string.Empty;
            }
            var buff = new byte[needed];
            int actual = IdsToTextRaw(model, ids, ids.Length, buff, buff.Length, skipSpecialTokens);
            if (actual <= 0 || actual > buff.Length)
            {
                return string.Empty;
            }
            // actual includes the trailing NUL
            return Encoding.UTF8.GetString(buff, 0, actual - 1);
        }

        // -- managed convenience iterators (same shapes as the reference) ----

        const int MaxTextLength = 1 << 20;

        public static IEnumerable<string> GetSentences(string paragraph)
        {
            var inBytes = Encoding.UTF8.GetBytes(paragraph);
            var outBytes = new byte[MaxTextLength];
            int actual = TextToSentences(inBytes, inBytes.Length, outBytes, outBytes.Length);
            if (actual <= 0 || actual > outBytes.Length)
            {
                yield break;
            }
            // sentences are separated by '\n' (actual counts the trailing NUL)
            foreach (var s in Encoding.UTF8.GetString(outBytes, 0, actual - 1).Split('\n'))
            {
                yield return s;
            }
        }

        public static IEnumerable<string> GetWords(string sentence)
        {
            var inBytes = Encoding.UTF8.GetBytes(sentence);
            var outBytes = new byte[MaxTextLength];
            int actual = TextToWords(inBytes, inBytes.Length, outBytes, outBytes.Length);
            if (actual <= 0 || actual > outBytes.Length)
            {
                yield break;
            }
            foreach (var w in Encoding.UTF8.GetString(outBytes, 0, actual - 1).Split(' '))
            {
                yield return w;
            }
        }

        public static IEnumerable<Tuple<string, int, int>> GetSentencesWithOffsets(string paragraph)
        {
            var inBytes = Encoding.UTF8.GetBytes(paragraph);
            var outBytes = new byte[MaxTextLength];
            var starts = new int[MaxTextLength];
            var ends = new int[MaxTextLength];
            int actual = TextToSentencesWithOffsets(inBytes, inBytes.Length, outBytes, starts, ends, outBytes.Length);
            if (actual <= 0 || actual > outBytes.Length)
            {
                yield break;
            }
            var pieces = Encoding.UTF8.GetString(outBytes, 0, actual - 1).Split('\n');
            for (int i = 0; i < pieces.Length; ++i)
            {
                yield return new Tuple<string, int, int>(pieces[i], starts[i], ends[i]);
            }
        }

        public static IEnumerable<Tuple<string, int, int>> GetWordsWithOffsets(string sentence)
        {
            var inBytes = Encoding.UTF8.GetBytes(sentence);
            var outBytes = new byte[MaxTextLength];
            var starts = new int[MaxTextLength];
            var ends = new int[MaxTextLength];
            int actual = TextToWordsWithOffsets(inBytes, inBytes.Length, outBytes, starts, ends, outBytes.Length);
            if (actual <= 0 || actual > outBytes.Length)
            {
                yield break;
            }
            var pieces = Encoding.UTF8.GetString(outBytes, 0, actual - 1).Split(' ');
            for (int i = 0; i < pieces.Length; ++i)
            {
                yield return new Tuple<string, int, int>(pieces[i], starts[i], ends[i]);
            }
        }
    }
}
