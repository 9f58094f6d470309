#!/usr/bin/env python3
"""Usage-weighted value of the Tagalog loanword lexicon (VERDICT r4
weak #6).

The held-out isip-split eval measured the loanword lexicon at +1 word
(splits are word-disjoint by construction, so a lexicon of CONVERSATION
loans barely intersects the held-out slice).  This measures the
artifact on the traffic it was built for: loan-heavy conversational
Filipino sentences.  For every loan token (usage-weighted — repeated
words count each time), compare the bare rule G2P against the
hand-authored lexicon transcription (the t1 front door's output); the
corrected fraction and rule PER on loan tokens are the lexicon's
measured production value.

The sentences were authored for this eval from common Taglish
conversation patterns; they are NOT drawn from the isip corpus and
never feed any tuning loop.

    python scripts/tagalog_loan_eval.py
"""

import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

# loan-heavy conversational sentences (Taglish); loans span commute,
# school, work, household, and money domains — the lexicon's coverage
SENTENCES = [
    "sumakay ako ng jeepney papunta sa airport kanina",
    "nasiraan ng aircon ang bus kaya init na init kami",
    "may brownout na naman kaya hindi gumagana ang computer",
    "binili ko ang cellphone at charger sa may grocery",
    "nag overtime ang driver dahil sa traffic sa highway",
    "kukunin ko ang salary ko bago ang weekend",
    "may meeting ang manager namin tungkol sa business",
    "ipinasa ng teacher ang homework bago ang interview",
    "pumunta kami sa hospital para sa dentist appointment",
    "nag aral siya sa college para maging engineer",
    "bumili ng chocolate cake para sa birthday ng baby",
    "naglagay ng cement ang carpenter sa building",
    "nawala ang password ng printer sa school",
    "nanood kami ng basketball championship sa weekend",
    "umorder kami ng hamburger at juice sa restaurant",
    "naglinis ang nurse ng freezer at refrigerator",
    "nag training ang dancer para sa disco tryout",
    "kinuha ng guard ang ticket ng motorcycle",
    "nagbayad ako ng bill sa counter gamit ang dollar",
    "inilagay ko ang folder at dictionary sa bag",
    "sumakay sa tricycle ang teenager papunta sa market",
    "may delivery ng gasoline para sa motor ng ferry",
    "kailangan ng schedule para sa babysitter ng family",
    "nakalimutan ng member ang deadline ng report",
    "bumili ng diaper at candy sa may hotel",
    "kumuha siya ng scholarship para sa kindergarten",
]


def main():
    from efficientspeech_tpu.text.g2p import read_lexicon
    from efficientspeech_tpu.text.tagalog_g2p import tagalog_g2p

    loan_path = os.path.join(REPO, "lexicon", "tagalog-loanwords.txt")
    loans = read_lexicon(loan_path)

    total = loan_tokens = corrected = 0
    dist = ref_len = 0
    from efficientspeech_tpu.text.g2p_eval import edit_distance

    diffs = []
    for s in SENTENCES:
        for w in re.findall(r"[a-z]+", s.lower()):
            total += 1
            if w not in loans:
                continue
            loan_tokens += 1
            ref = list(loans[w])
            hyp = tagalog_g2p(w)
            d = edit_distance(hyp, ref)
            dist += d
            ref_len += len(ref)
            if d:
                corrected += 1
                diffs.append((w, " ".join(hyp), " ".join(ref)))
    print(f"tokens: {total} total, {loan_tokens} loans "
          f"({loan_tokens / total:.1%} of running words)")
    print(f"rules-only vs authored transcription on loan tokens: "
          f"{corrected}/{loan_tokens} corrected by the lexicon "
          f"({corrected / loan_tokens:.1%}), PER {dist / ref_len:.1%}")
    for w, hyp, ref in diffs[:15]:
        print(f"  {w:>14}: rules [{hyp}]  ->  lexicon [{ref}]")
    return loan_tokens, corrected, dist / ref_len


if __name__ == "__main__":
    main()
