"""Dictionary tables for the synthetic person generator (S1).

The reference fills person string attributes by uniform sampling from
in-source dictionary arrays (beans/NewPersonEvent0.java:72-82 drawing from
original/Firstnames.java, original/Lastnames.java, original/Emails.java,
original/Cities.java, original/Countries.java — ~1,800 LoC of data tables).
These lists reproduce the BEHAVIOR (uniform draw per field per person) with
modest original word lists — the reference's exact tables are not copied;
what matters to queries is that the attributes are low-cardinality
dictionary draws, not which particular spellings appear.

Sampling uses an md5-derived index (``generator._u32``) rather than Spark's
murmur3 ``hash()`` so the SAME draw is expressible in ANSI SQL — which is
what lets generated-data queries sit under the DuckDB oracle gate.
"""

from __future__ import annotations

FIRSTNAMES = [
    "Ada", "Alan", "Alice", "Amara", "Amir", "Anya", "Bjorn", "Carlos",
    "Chen", "Dana", "Dmitri", "Elena", "Emeka", "Fatima", "Grace", "Hana",
    "Ivan", "Jamal", "Kai", "Lars", "Leila", "Luca", "Maya", "Nadia",
    "Noor", "Omar", "Priya", "Quinn", "Ravi", "Sofia", "Tomas", "Yuki",
]

LASTNAMES = [
    "Abara", "Bennett", "Castillo", "Dubois", "Eriksen", "Fischer",
    "Garcia", "Haddad", "Ivanov", "Jensen", "Kimura", "Lindqvist",
    "Moreau", "Nakamura", "Okafor", "Petrov", "Quintero", "Rossi",
    "Schneider", "Takahashi", "Ueda", "Vargas", "Weber", "Xu",
    "Yamamoto", "Zhang", "Almeida", "Burke", "Costa", "Duarte",
    "Egede", "Farah",
]

# the reference's Emails.java holds bare domain-ish tokens; province is
# (quirkily) drawn from the SAME table (NewPersonEvent0.java:78)
EMAILS = [
    "acme.example", "blue.example", "cedar.example", "delta.example",
    "echo.example", "forge.example", "gale.example", "harbor.example",
    "iris.example", "juniper.example", "krill.example", "lumen.example",
    "mesa.example", "nimbus.example", "onyx.example", "prairie.example",
]

CITIES = [
    "Aarhus", "Bandung", "Cusco", "Davao", "Esbjerg", "Fukuoka",
    "Gdansk", "Hobart", "Izmir", "Jaipur", "Kumasi", "Leipzig",
    "Mombasa", "Nagoya", "Oulu", "Porto", "Quito", "Recife",
    "Sapporo", "Tartu", "Utrecht", "Valencia", "Windhoek", "Xalapa",
    "Yokohama", "Zagreb", "Antofagasta", "Bergen", "Cali", "Dresden",
    "Eindhoven", "Faro",
]

COUNTRIES = [
    "Argentina", "Brazil", "Canada", "Denmark", "Ecuador", "Finland",
    "Ghana", "Hungary", "India", "Japan", "Kenya", "Lithuania",
    "Mexico", "Norway", "Oman", "Peru", "Qatar", "Romania",
    "Senegal", "Thailand", "Uruguay", "Vietnam", "Zambia", "Austria",
]

# fixed-value fields, exactly as the reference hard-codes them
# (NewPersonEvent0.java:80-81)
CREDITCARD = "00000000000"
ZIPCODE = "10587"
