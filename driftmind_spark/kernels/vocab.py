"""Closed entity/predicate vocabulary shared by the synthesizer and the
OpenIE kernel.

FIXTURES.md §B requires entity-bearing sentences drawn from a closed
vocabulary (so expected triples are computable exactly), planted
near-duplicate surfaces with known cluster ids, an alias dictionary, and
Zipf-skewed head entities.
"""

from __future__ import annotations

# canonical entity -> list of surface variants (index 0 = canonical surface).
# Variants are deliberate near-duplicates for the MinHash-LSH (K2/K3) and
# connected-components (K6) stages.
ENTITY_SURFACES: dict[str, list[str]] = {
    "Acme Corp": ["Acme Corp", "Acme Corporation", "ACME CORP", "Acme-Corp"],
    "Beta Systems": ["Beta Systems", "Beta Systems AG", "beta systems"],
    "Gamma Holdings": ["Gamma Holdings", "Gamma Holdings Ltd", "Gamma-Holdings"],
    "Delta Logistics": ["Delta Logistics", "Delta Logistics GmbH"],
    "Epsilon Energy": ["Epsilon Energy", "Epsilon Energy Inc", "EPSILON ENERGY"],
    "Zeta Robotics": ["Zeta Robotics", "Zeta Robotics Co"],
    "Eta Biotech": ["Eta Biotech", "Eta BioTech"],
    "Theta Capital": ["Theta Capital", "Theta Capital Partners"],
    "Iota Media": ["Iota Media", "Iota Media Group"],
    "Kappa Software": ["Kappa Software", "Kappa Software SE"],
    "Lambda Motors": ["Lambda Motors", "Lambda Motors Corp"],
    "Mu Networks": ["Mu Networks", "Mu Networks LLC"],
    "Nu Pharma": ["Nu Pharma", "Nu Pharmaceuticals"],
    "Xi Semiconductors": ["Xi Semiconductors", "Xi Semi"],
    "Omicron Foods": ["Omicron Foods", "Omicron Foods Inc"],
    "Pi Airlines": ["Pi Airlines", "Pi Air"],
    "Rho Insurance": ["Rho Insurance", "Rho Insurance Group"],
    "Sigma Mining": ["Sigma Mining", "Sigma Mining Plc"],
    "Tau Telecom": ["Tau Telecom", "Tau Telekom"],
    "Upsilon Games": ["Upsilon Games", "Upsilon Game Studios"],
    "Alice Turing": ["Alice Turing", "A. Turing"],
    "Bob Hopper": ["Bob Hopper", "B. Hopper"],
    "Carol Lovelace": ["Carol Lovelace", "C. Lovelace"],
    "Dan Knuth": ["Dan Knuth", "D. Knuth"],
    "Eve Dijkstra": ["Eve Dijkstra", "E. Dijkstra"],
    "Berlin": ["Berlin"],
    "Munich": ["Munich", "München"],
    "Hamburg": ["Hamburg"],
    "New York": ["New York", "New York City"],
    "London": ["London"],
    "Paris": ["Paris"],
    "Tokyo": ["Tokyo"],
    "Nova Labs": ["Nova Labs", "NovaLabs"],
    "Orion Bank": ["Orion Bank", "Orion Bancorp"],
    "Vega Cloud": ["Vega Cloud", "Vega Cloud Services"],
    "Quasar AI": ["Quasar AI", "Quasar Artificial Intelligence"],
    "Pulsar Shipping": ["Pulsar Shipping", "Pulsar Ship Co"],
    "Comet Retail": ["Comet Retail", "Comet Retail Group"],
    "Meteor Steel": ["Meteor Steel", "Meteor Stahl"],
    "Aurora Health": ["Aurora Health", "Aurora Healthcare"],
}

CANONICAL_ENTITIES: list[str] = list(ENTITY_SURFACES.keys())

# surface -> canonical (the broadcastable alias dictionary, K5/J7)
ALIASES: dict[str, str] = {
    surface: canon
    for canon, surfaces in ENTITY_SURFACES.items()
    for surface in surfaces
}

# predicate id -> language -> verb phrase used in generated sentences.
# Phrases are chosen to be unambiguous (no phrase is a substring of another
# within a language), so pattern extraction is exact.
PREDICATES: dict[str, dict[str, str]] = {
    "acquired": {"en": "acquired", "de": "übernahm"},
    "founded": {"en": "founded", "de": "gründete"},
    "partnered_with": {"en": "partnered with", "de": "kooperierte mit"},
    "headquartered_in": {"en": "is headquartered in", "de": "hat den Hauptsitz in"},
    "ceo_of": {"en": "is the chief executive of", "de": "leitet als Geschäftsführerin"},
    "invested_in": {"en": "invested in", "de": "investierte in"},
    "launched": {"en": "launched a joint venture with", "de": "startete ein Gemeinschaftsunternehmen mit"},
    "sued": {"en": "filed a lawsuit against", "de": "verklagte"},
    "supplies": {"en": "supplies components to", "de": "beliefert"},
    "competes_with": {"en": "competes with", "de": "konkurriert mit"},
}

# Entity-free filler sentences (noise the extractor must not fire on).
FILLER_SENTENCES: dict[str, list[str]] = {
    "en": [
        "The quarterly report was published on schedule.",
        "Markets remained calm throughout the session.",
        "Analysts expect further details next week.",
        "The weather in the region stayed mild.",
        "No further comments were made by officials.",
        "Trading volumes were slightly below average.",
        "The committee will reconvene after the holidays.",
        "Several questions remain open for now.",
    ],
    "de": [
        "Der Quartalsbericht erschien pünktlich.",
        "Die Märkte blieben im Handelsverlauf ruhig.",
        "Analysten erwarten nächste Woche weitere Details.",
        "Das Wetter in der Region blieb mild.",
        "Weitere Stellungnahmen gab es zunächst nicht.",
        "Die Handelsvolumina lagen leicht unter dem Durchschnitt.",
    ],
}

# Boilerplate decoy sentences planted OUTSIDE the main-content region; a
# naive extractor that keeps nav/footer text will emit false triples from
# these and fail the precision gate.
DECOY_SENTENCES: dict[str, list[str]] = {
    "en": [
        "Acme Corp acquired SpamCo in our sponsored section.",
        "Subscribe now and Orion Bank invested in your future.",
        "Cookie notice: London is headquartered in your browser.",
    ],
    "de": [
        "Anzeige: Meteor Steel übernahm WerbungsGmbH.",
        "Newsletter: Tau Telecom verklagte niemanden.",
    ],
}
