"""Deterministic wordlists backing the pseudonymization transforms.

The reference ships text wordlists (``slice_db/data/*.txt``) whose exact
contents pin its golden outputs.  We deliberately ship our *own* lists (kept
in-code — no data files to package): outputs remain deterministic for a
given pepper (the documented contract, reference README.md:116-118) but are
not byte-identical to the reference's goldens; our golden tests pin ours.
"""

GIVEN_NAMES = [
    "Alice", "Amara", "Andre", "Anika", "Asher", "Bella", "Bruno", "Carla",
    "Cedric", "Chloe", "Daniel", "Daria", "Devon", "Elena", "Elias", "Erin",
    "Felix", "Fiona", "Gavin", "Greta", "Hank", "Hazel", "Ian", "Ingrid",
    "Jonas", "Julia", "Kara", "Kevin", "Lena", "Liam", "Mabel", "Marcus",
    "Nadia", "Noah", "Olga", "Oscar", "Paula", "Peter", "Quinn", "Rosa",
    "Ruben", "Sara", "Simon", "Tara", "Tobias", "Uma", "Victor", "Wendy",
    "Xavier", "Yara", "Zane",
]

SURNAMES = [
    "Abbott", "Alvarez", "Barnes", "Becker", "Carter", "Chavez", "Dalton",
    "Dawson", "Ellis", "Erikson", "Farley", "Fischer", "Garner", "Greene",
    "Harmon", "Hopkins", "Ibarra", "Ingram", "Jacobs", "Jensen", "Keller",
    "Kirby", "Lawson", "Lucero", "Maddox", "Mercer", "Nolan", "Norris",
    "Osborne", "Owens", "Parker", "Preston", "Quigley", "Ramsey", "Reeves",
    "Salazar", "Sherman", "Tanner", "Thornton", "Underwood", "Vargas",
    "Vaughn", "Walters", "Weber", "Xiong", "Yates", "Zimmer",
]

STREETS = [
    "Oak Street", "Maple Avenue", "Cedar Lane", "Elm Drive", "Pine Court",
    "Birch Road", "Walnut Way", "Chestnut Boulevard", "Willow Terrace",
    "Aspen Circle", "Juniper Place", "Magnolia Street", "Sycamore Avenue",
    "Hickory Lane", "Poplar Drive", "Laurel Court", "Alder Road",
    "Redwood Way", "Spruce Boulevard", "Hawthorn Terrace",
]

CITIES = [
    "Ashford", "Brookfield", "Cedarville", "Dunmore", "Eastport", "Fairview",
    "Glenwood", "Harborton", "Ironwood", "Jasperville", "Kingsford",
    "Lakemont", "Millbrook", "Northgate", "Oakdale", "Pinehurst",
    "Quarryville", "Riverton", "Stonebridge", "Thornfield", "Umberland",
    "Valemont", "Westbrook", "Yarrowdale", "Zephyrhill",
]

# zips grouped so GeozipTransform can pick a different zip sharing the
# first-3-digit prefix (reference behavior, slice_db/transforms/address.py:81-113)
ZIPS = [
    "10001", "10002", "10003", "10011", "10012",
    "30301", "30302", "30303", "30305", "30309",
    "60601", "60602", "60605", "60607", "60611",
    "73301", "73344", "73960",
    "94101", "94102", "94103", "94107", "94110",
    "94301", "94302", "94303", "94304", "94305", "94306",
    "98101", "98102", "98104", "98109", "98112",
]

US_STATES = [
    ("AL", "Alabama"), ("AK", "Alaska"), ("AZ", "Arizona"), ("AR", "Arkansas"),
    ("CA", "California"), ("CO", "Colorado"), ("CT", "Connecticut"),
    ("DE", "Delaware"), ("FL", "Florida"), ("GA", "Georgia"), ("HI", "Hawaii"),
    ("ID", "Idaho"), ("IL", "Illinois"), ("IN", "Indiana"), ("IA", "Iowa"),
    ("KS", "Kansas"), ("KY", "Kentucky"), ("LA", "Louisiana"), ("ME", "Maine"),
    ("MD", "Maryland"), ("MA", "Massachusetts"), ("MI", "Michigan"),
    ("MN", "Minnesota"), ("MS", "Mississippi"), ("MO", "Missouri"),
    ("MT", "Montana"), ("NE", "Nebraska"), ("NV", "Nevada"),
    ("NH", "New Hampshire"), ("NJ", "New Jersey"), ("NM", "New Mexico"),
    ("NY", "New York"), ("NC", "North Carolina"), ("ND", "North Dakota"),
    ("OH", "Ohio"), ("OK", "Oklahoma"), ("OR", "Oregon"),
    ("PA", "Pennsylvania"), ("RI", "Rhode Island"), ("SC", "South Carolina"),
    ("SD", "South Dakota"), ("TN", "Tennessee"), ("TX", "Texas"),
    ("UT", "Utah"), ("VT", "Vermont"), ("VA", "Virginia"),
    ("WA", "Washington"), ("WV", "West Virginia"), ("WI", "Wisconsin"),
    ("WY", "Wyoming"),
]

WORDS = [
    "ox", "an", "it", "us", "elk", "fox", "ant", "owl", "ram", "cod",
    "bear", "wolf", "hawk", "newt", "dove", "crab", "toad", "swan",
    "otter", "raven", "heron", "moose", "gecko", "skunk", "viper",
    "badger", "falcon", "marmot", "osprey", "python", "turtle", "weasel",
    "buzzard", "cheetah", "echidna", "giraffe", "panther", "pelican",
    "antelope", "flamingo", "hedgehog", "mongoose", "platypus", "squirrel",
    "armadillo", "chameleon", "orangutan", "porcupine", "wolverine",
    "chimpanzee", "kingfisher", "salamander",
]


def words_by_length(words: list[str] | None = None) -> dict[int, list[str]]:
    out: dict[int, list[str]] = {}
    for w in WORDS if words is None else words:
        out.setdefault(len(w), []).append(w)
    return out


def zips_by_prefix(zips: list[str] | None = None) -> dict[str, list[str]]:
    out: dict[str, list[str]] = {}
    for z in ZIPS if zips is None else zips:
        out.setdefault(z[:3], []).append(z)
    return out


# -------------------------------------------------- external wordlist sets

from dataclasses import dataclass, field  # noqa: E402


@dataclass
class WordlistSet:
    """The wordlists a transform registry draws from.

    ``default()`` uses the in-code lists above.  ``from_dir()`` is the
    reference-golden compat mode: point it at a directory laid out like
    the reference's data package (``given-name.txt``, ``surname.txt``,
    ``street.txt``, ``city.txt``, ``zip.txt``, ``us-state.txt`` +
    parallel ``us-state-abbr.txt``, ``word.txt`` — one entry per line,
    `slice_db/transforms/person.py:9-22`, `address.py:10-146`,
    `text.py:141-146`) and a user supplying the reference's own files
    reproduces its pseudonym streams without this repo shipping them."""

    given_names: list[str] = field(default_factory=lambda: list(GIVEN_NAMES))
    surnames: list[str] = field(default_factory=lambda: list(SURNAMES))
    streets: list[str] = field(default_factory=lambda: list(STREETS))
    cities: list[str] = field(default_factory=lambda: list(CITIES))
    zips: list[str] = field(default_factory=lambda: list(ZIPS))
    states: list[tuple[str, str]] = field(default_factory=lambda: list(US_STATES))
    words: list[str] = field(default_factory=lambda: list(WORDS))

    @classmethod
    def default(cls) -> "WordlistSet":
        return cls()

    @classmethod
    def from_dir(cls, path: str) -> "WordlistSet":
        import os

        def lines(fn: str, fallback: list[str]) -> list[str]:
            p = os.path.join(path, fn)
            if not os.path.exists(p):
                return list(fallback)
            with open(p) as f:
                return [ln.strip() for ln in f if ln.strip()]

        abbrs = lines("us-state-abbr.txt", [a for a, _ in US_STATES])
        names = lines("us-state.txt", [n for _, n in US_STATES])
        if len(abbrs) != len(names):
            raise ValueError("us-state.txt and us-state-abbr.txt must be parallel lists")
        return cls(
            given_names=lines("given-name.txt", GIVEN_NAMES),
            surnames=lines("surname.txt", SURNAMES),
            streets=lines("street.txt", STREETS),
            cities=lines("city.txt", CITIES),
            zips=lines("zip.txt", ZIPS),
            states=list(zip(abbrs, names)),
            words=lines("word.txt", WORDS),
        )

    def words_by_length(self) -> dict[int, list[str]]:
        return words_by_length(self.words)

    def zips_by_prefix(self) -> dict[str, list[str]]:
        return zips_by_prefix(self.zips)
