// Test-only golden oracle: instantiates the ORIGINAL reference client
// library's legacy engine templates (word guessers, HMM tagger, dictionary
// interpreter, stemmer, word->prob, regexp tags, WRE parser, transforms)
// and exports flat C entry points for the parity tests to drive via ctypes.
//
// This shim exists purely to mint ground-truth outputs from the reference
// implementation (SURVEY.md section 7: compiling the reference for fixtures
// is a test-only dependency).  Nothing here ships with the framework.

#include <cstring>
#include <new>

#include "FAConfig.h"
#include "FAAllocator.h"
#include "FAMorphLDB_t_packaged.h"
#include "FAStemmerLDB.h"
#include "FAWordGuesser_t.h"
#include "FAWordGuesser_prob_t.h"
#include "FAHmmTagger_l1.h"
#include "FADictInterpreter_t.h"
#include "FAWordToProb_t.h"
#include "FAStemmer_t.h"
#include "FARegexpTags_t.h"
#include "FAWbdConfKeeper.h"
#include "FALDB.h"
#include "FAT2PTable.h"
#include "FATs2PTable.h"
#include "FAWreLexTools_t.h"
#include "FAParserConfKeeper.h"
#include "FAParseTree.h"
#include "FATransform_hyph_redup_t.h"
#include "FATransform_hyph_redup_rev_t.h"
#include "FATransform_prefix_t.h"
#include "FATransform_prefix_rev_t.h"
#include "FATransform_capital_t.h"
#include "FATransform_capital_rev_t.h"
#include "FATransform_unescape_t.h"
#include "FATransform_cascade_t.h"
#include "FARSDfa_pack_triv.h"

using namespace BlingFire;

extern "C" {

// ---------------------------------------------------------------- morph ldb

struct MorphHandle {
    FAMorphLDB_t<int> ldb;
    FAAllocator alloc;
};

void *Shim_LoadMorph(const unsigned char *img) {
    MorphHandle *h = new MorphHandle();
    h->ldb.SetImage(img);
    return h;
}

void Shim_FreeMorph(void *vh) { delete (MorphHandle *)vh; }

// which: 0=w2t 1=b2t 2=w2tp 3=w2tpl 4=w2tpr
static const FAWgConfKeeper *wg_conf(MorphHandle *h, int which) {
    switch (which) {
    case 0: return h->ldb.GetW2TConf();
    case 1: return h->ldb.GetB2TConf();
    case 2: return h->ldb.GetW2TPConf();
    case 3: return h->ldb.GetW2TPLConf();
    case 4: return h->ldb.GetW2TPRConf();
    }
    return 0;
}

int Shim_Wg(void *vh, int which, const int *word, int len, int *out, int max) {
    MorphHandle *h = (MorphHandle *)vh;
    const FAWgConfKeeper *conf = wg_conf(h, which);
    if (!conf) return -100;
    FAWordGuesser_t<int> g;
    g.Initialize(conf, h->ldb.GetInTr());
    return g.Process(word, len, out, max);
}

int Shim_WgProb(void *vh, int which, const int *word, int len, int *tags,
                float *probs, int max) {
    MorphHandle *h = (MorphHandle *)vh;
    const FAWgConfKeeper *conf = wg_conf(h, which);
    if (!conf) return -100;
    FAWordGuesser_prob_t<int> g;
    g.Initialize(conf, h->ldb.GetInTr());
    return g.Process(word, len, tags, probs, max);
}

int Shim_TagDictId(void *vh, const int *word, int len) {
    MorphHandle *h = (MorphHandle *)vh;
    const FADictConfKeeper *conf = h->ldb.GetTagDictConf();
    if (!conf) return -100;
    FADictInterpreter_t<int> d;
    d.SetConf(conf, h->ldb.GetInTr());
    return d.GetInfoId(word, len);
}

int Shim_TagDictInfo(void *vh, const int *word, int len, int *out, int max) {
    MorphHandle *h = (MorphHandle *)vh;
    const FADictConfKeeper *conf = h->ldb.GetTagDictConf();
    if (!conf) return -100;
    FADictInterpreter_t<int> d;
    d.SetConf(conf, h->ldb.GetInTr());
    return d.GetInfo(word, len, out, max);
}

float Shim_T2P(void *vh, int tag) {
    MorphHandle *h = (MorphHandle *)vh;
    FAT2PTable t;
    t.SetConf(h->ldb.GetT2PConf());
    return t.GetProb(tag);
}

float Shim_Ts2P(void *vh, int t1, int t2) {
    MorphHandle *h = (MorphHandle *)vh;
    FATs2PTable t;
    t.SetConf(h->ldb.GetTT2PConf());
    return t.GetProb(t1, t2);
}

// words: concatenated; lens: per-word lengths
int Shim_Hmm(void *vh, const int *words, const int *lens, int n_words,
             int max_tags, int *out, int max_out) {
    MorphHandle *h = (MorphHandle *)vh;
    const FAWgConfKeeper *conf = h->ldb.GetW2TPConf();
    if (!conf) return -100;
    FAWordGuesser_prob_t<int> g;
    g.Initialize(conf, h->ldb.GetInTr());
    FAT2PTable pt;
    pt.SetConf(h->ldb.GetT2PConf());
    FATs2PTable ptt;
    ptt.SetConf(h->ldb.GetTT2PConf());
    FAHmmTagger_l1 tagger;
    tagger.Initialize(&g, &pt, &ptt, conf->GetEosTag(), max_tags, &h->alloc);
    const int *p = words;
    for (int i = 0; i < n_words; ++i) {
        tagger.AddWord(p, lens[i]);
        p += lens[i];
    }
    (void)max_out;
    return tagger.Process(out, max_out);
}

// ------------------------------------------------------------- stemmer ldb

struct StemHandle {
    FAStemmerLDB ldb;
};

void *Shim_LoadStemmer(const unsigned char *img) {
    StemHandle *h = new StemHandle();
    h->ldb.SetImage(img);
    return h;
}

void Shim_FreeStemmer(void *vh) { delete (StemHandle *)vh; }

// op: 0=w2b 1=b2w 2=w2w 3=wt2b 4=b2wt 5=wtt2w
int Shim_Stem(void *vh, int op, const int *word, int len, int t1, int t2,
              int *out, int max) {
    StemHandle *h = (StemHandle *)vh;
    FAStemmer_t<int> s;
    s.Initialize(&h->ldb);
    switch (op) {
    case 0: return s.ProcessW2B(word, len, out, max);
    case 1: return s.ProcessB2W(word, len, out, max);
    case 2: return s.ProcessW2W(word, len, out, max);
    case 3: return s.ProcessWT2B(word, len, t1, out, max);
    case 4: return s.ProcessB2WT(word, len, t1, out, max);
    case 5: return s.ProcessWTT2W(word, len, t1, t2, out, max);
    }
    return -100;
}

int Shim_W2PInt(void *vh, const int *word, int len) {
    StemHandle *h = (StemHandle *)vh;
    const FAW2PConfKeeper *conf = h->ldb.GetW2PConf();
    if (!conf) return -100;
    FAWordToProb_t<int> w;
    w.SetConf(conf, 0);
    return w.GetIntProb(word, len);
}

float Shim_W2PProb(void *vh, const int *word, int len) {
    StemHandle *h = (StemHandle *)vh;
    const FAW2PConfKeeper *conf = h->ldb.GetW2PConf();
    if (!conf) return -1e30f;
    FAWordToProb_t<int> w;
    w.SetConf(conf, 0);
    return w.GetProb(word, len);
}

// ------------------------------------------------------------- regexp tags

struct WbdHandle {
    FALDB ldb;
    FAWbdConfKeeper conf;
};

void *Shim_LoadWbd(const unsigned char *img) {
    WbdHandle *h = new WbdHandle();
    h->ldb.SetImage(img);
    const int *pValues = 0;
    const int Size = h->ldb.GetHeader()->Get(FAFsmConst::FUNC_WBD, &pValues);
    h->conf.Initialize(&h->ldb, pValues, Size);
    return h;
}

void Shim_FreeWbd(void *vh) { delete (WbdHandle *)vh; }

int Shim_RegexpTags(void *vh, const int *in, int len, int *tags, int *scores,
                    int max) {
    WbdHandle *h = (WbdHandle *)vh;
    FARegexpTags_t<int> rt;
    rt.Initialize(&h->conf);
    const int *pTags = 0;
    const int *pScores = 0;
    const int n = rt.Process(in, len, &pTags, &pScores);
    if (n < 0) return n;
    const int m = n < max ? n : max;
    memcpy(tags, pTags, m * sizeof(int));
    memcpy(scores, pScores, m * sizeof(int));
    return n;
}

// -------------------------------------------------------------- wre parser

struct WreHandle {
    FAMorphLDB_t<int> ldb;
    FAAllocator alloc;
    FAParserConfKeeper conf;
    bool has_conf;
};

void *Shim_LoadWre(const unsigned char *img) {
    WreHandle *h = new WreHandle();
    h->ldb.SetImage(img);
    const int *pValues = 0;
    const int Size = h->ldb.GetHeader()->Get(FAFsmConst::FUNC_WRE, &pValues);
    h->has_conf = Size > 0;
    if (h->has_conf) {
        h->conf.Initialize(&h->ldb, pValues, Size);
    }
    return h;
}

void Shim_FreeWre(void *vh) { delete (WreHandle *)vh; }

// words: concatenated cps; lens/tags/dcts per word.
// out: final upper-level labels after parsing; returns constituent count
// (negative on error); *out_len receives the upper-level size.
int Shim_Wre(void *vh, const int *words, const int *lens, const int *tags,
             const int *dcts, int n_words, int *out, int max_out,
             int *out_len) {
    WreHandle *h = (WreHandle *)vh;
    if (!h->has_conf) return -100;

    FADictInterpreter_t<int> dict;
    const FADictConfKeeper *dconf = h->ldb.GetTagDictConf();
    if (dconf) {
        dict.SetConf(dconf, h->ldb.GetInTr());
    }

    FAWreLexTools_t<int> wre;
    wre.Initialize(&h->alloc, &h->conf, dconf ? &dict : 0);

    FAParseTree tree(&h->alloc);
    tree.Init(n_words);

    wre.Reset(n_words);
    const int *p = words;
    for (int i = 0; i < n_words; ++i) {
        wre.AddWord(p, lens[i], tags[i], dcts ? dcts[i] : -1);
        p += lens[i];
    }
    wre.SetParseTree(&tree);
    const int added = wre.Process();

    tree.Update();
    const int *pLabels = 0;
    const int n = tree.GetUpperLabels(&pLabels);
    const int m = n < max_out ? n : max_out;
    memcpy(out, pLabels, m * sizeof(int));
    *out_len = n;
    return added;
}

// -------------------------------------------------------------- transforms

// kind: 0=hyph_redup 1=hyph_redup_rev 2=prefix 3=prefix_rev 4=ucf 5=ucf_rev
//       6=unescape
// pref_img: packed prefix DFA image (kind 2 only), else NULL
int Shim_Transform(int kind, int delim, const unsigned char *pref_img,
                   const int *in, int len, int *out, int max) {
    switch (kind) {
    case 0: {
        FATransform_hyph_redup_t<int> t;
        if (delim >= 0) t.SetDelim(delim);
        return t.Process(in, len, out, max);
    }
    case 1: {
        FATransform_hyph_redup_rev_t<int> t;
        if (delim >= 0) t.SetDelim(delim);
        return t.Process(in, len, out, max);
    }
    case 2: {
        FARSDfa_pack_triv dfa;
        dfa.SetImage(pref_img);
        FATransform_prefix_t<int> t;
        if (delim >= 0) t.SetDelim(delim);
        t.SetRsDfa(&dfa);
        return t.Process(in, len, out, max);
    }
    case 3: {
        FATransform_prefix_rev_t<int> t;
        if (delim >= 0) t.SetDelim(delim);
        return t.Process(in, len, out, max);
    }
    case 4: {
        FATransform_capital_t<int> t;
        if (delim >= 0) t.SetDelim(delim);
        return t.Process(in, len, out, max);
    }
    case 5: {
        FATransform_capital_rev_t<int> t;
        if (delim >= 0) t.SetDelim(delim);
        return t.Process(in, len, out, max);
    }
    case 6: {
        FATransform_unescape_t<int> t;
        return t.Process(in, len, out, max);
    }
    }
    return -100;
}

}  // extern "C"
