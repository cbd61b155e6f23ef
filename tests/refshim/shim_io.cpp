// Test-only oracle for the textual FSM interchange format: drives the
// ORIGINAL reference FAAutIOTools / FAMapIOTools through a read->print
// round trip, so the parity tests can prove that text printed by
// blingfire_tpu/compiler/fsmio.py is readable by the reference toolchain
// and vice versa (reference: blingfirecompile.library/src/FAAutIOTools.cpp,
// FAMapIOTools.cpp — the interchange between all fa_* build tools).
//
// Nothing here ships with the framework.

#include <cstring>
#include <sstream>
#include <string>

#include "FAConfig.h"
#include "FAAllocator.h"
#include "FAAutIOTools.h"
#include "FAMapIOTools.h"
#include "FARSDfa_wo_ro.h"
#include "FARSNfa_wo_ro.h"
#include "FAMealyDfa.h"
#include "FAMealyNfa.h"
#include "FAState2Ow.h"
#include "FAState2Ows.h"
#include "FAMultiMap_ar.h"
#include "FAChain2Num_hash.h"
#include "FAException.h"

using namespace BlingFire;

static int copy_out(const std::string& s, char* out, int max_out) {
    const int n = (int)s.size();
    if (out && max_out >= n) std::memcpy(out, s.data(), n);
    return n;
}

extern "C" {

// kind: 1=rs-dfa, 2=mealy-dfa, 3=moore-dfa (State2Ow),
//       4=moore-mdfa (State2Ows), 5=rs-nfa, 6=mealy-nfa
// returns the number of bytes of the re-printed text (negative on error)
int Shim_AutTxtRoundTrip(int kind, const char* in_text, int in_len,
                         char* out, int max_out) {
    try {
        FAAllocator alloc;
        FAAutIOTools io(&alloc);
        std::istringstream is(std::string(in_text, in_len));
        std::ostringstream os;

        switch (kind) {
        case 1: {
            FARSDfa_wo_ro dfa(&alloc);
            io.Read(is, &dfa);
            io.Print(os, &dfa);
            break;
        }
        case 2: {
            FARSDfa_wo_ro dfa(&alloc);
            FAMealyDfa ows(&alloc);
            ows.SetRsDfa(&dfa);
            io.Read(is, &dfa, &ows);
            io.Print(os, &dfa, &ows);
            break;
        }
        case 3: {
            FARSDfa_wo_ro dfa(&alloc);
            FAState2Ow ow(&alloc);
            io.Read(is, &dfa, &ow);
            io.Print(os, &dfa, &ow);
            break;
        }
        case 4: {
            FARSDfa_wo_ro dfa(&alloc);
            FAState2Ows ows(&alloc);
            io.Read(is, &dfa, &ows);
            io.Print(os, &dfa, &ows);
            break;
        }
        case 5: {
            FARSNfa_wo_ro nfa(&alloc);
            io.Read(is, &nfa);
            io.Print(os, &nfa);
            break;
        }
        case 6: {
            FARSNfa_wo_ro nfa(&alloc);
            FAMealyNfa ows(&alloc);
            io.Read(is, &nfa, &ows);
            io.Print(os, &nfa, &ows);
            break;
        }
        default:
            return -2;
        }
        return copy_out(os.str(), out, max_out);
    } catch (...) {
        return -1;
    }
}

// kind: 1=multi-map, 2=chain2num, 3=int-array
int Shim_MapTxtRoundTrip(int kind, const char* in_text, int in_len,
                         char* out, int max_out) {
    try {
        FAAllocator alloc;
        FAMapIOTools io(&alloc);
        std::istringstream is(std::string(in_text, in_len));
        std::ostringstream os;

        switch (kind) {
        case 1: {
            FAMultiMap_ar mmap;
            mmap.SetAllocator(&alloc);
            io.Read(is, (FAMultiMapA*)&mmap);
            io.Print(os, (const FAMultiMapA*)&mmap);
            break;
        }
        case 2: {
            FAChain2Num_hash c2n;
            c2n.SetAllocator(&alloc);
            io.Read(is, (FAChain2NumA*)&c2n);
            io.Print(os, (const FAChain2NumA*)&c2n);
            break;
        }
        case 3: {
            const int* arr = NULL;
            int count = 0;
            io.Read(is, &arr, &count);
            io.Print(os, arr, count);
            break;
        }
        default:
            return -2;
        }
        return copy_out(os.str(), out, max_out);
    } catch (...) {
        return -1;
    }
}

}  // extern "C"
