"""Deterministic IMDb-shaped TSV fixtures (FIXTURES.md).

Tiny scale, seeded, with the adversarial cases the correctness contract
needs: literal \\N sentinels, junk isAdult values, prefix-id pairs
(nm0000001 vs nm00000010) for membership-flag semantics, exact
(avg_rating, avg_votes) ties for top-N determinism, and titles missing
from akas/crew/principals for left-join NULL paths.
"""

from __future__ import annotations

import os
import random

GENRES = [
    "Action", "Adventure", "Comedy", "Crime", "Documentary", "Drama",
    "Family", "Fantasy", "Horror", "Music", "Romance", "Sci-Fi",
    "Short", "Thriller", "Adult",
]
TYPES = ["movie", "tvMovie", "short", "tvShort", "tvSeries", "video"]
PROFESSIONS = ["actor", "actress", "writer", "director", "producer", "composer"]
REGIONS = ["US", "DE", "FR", "UA", "JP", "GB"]
CATEGORIES = ["actor", "actress", "writer", "director", "producer", "self"]

N_TITLES = 400
N_PEOPLE = 120
NULL = r"\N"


def _tsv(path: str, header: list[str], rows: list[list]) -> None:
    with open(path, "w", encoding="utf-8") as f:
        f.write("\t".join(header) + "\n")
        for row in rows:
            f.write(
                "\t".join(NULL if v is None else str(v) for v in row) + "\n"
            )


def generate(data_dir: str, seed: int = 42) -> None:
    rng = random.Random(seed)
    os.makedirs(data_dir, exist_ok=True)

    # people — includes the adversarial prefix pair nm0000001/nm00000010
    people_ids = [f"nm{i:07d}" for i in range(1, N_PEOPLE + 1)]
    people_ids[1] = "nm00000010"  # prefix of people_ids[0]='nm0000001'
    title_ids = [f"tt{i:07d}" for i in range(1, N_TITLES + 1)]

    name_rows = []
    for pid in people_ids:
        known = rng.sample(title_ids, rng.randint(1, 4)) if rng.random() > 0.11 else None
        profs = rng.sample(PROFESSIONS, rng.randint(1, 3)) if rng.random() > 0.2 else None
        name_rows.append(
            [
                pid,
                f"Person {pid}",
                rng.randint(1900, 2000) if rng.random() > 0.5 else None,
                None,
                ",".join(profs) if profs else None,
                ",".join(known) if known else None,
            ]
        )
    _tsv(
        f"{data_dir}/name_basics.tsv",
        ["nconst", "primaryName", "birthYear", "deathYear",
         "primaryProfession", "knownForTitles"],
        name_rows,
    )

    basics_rows, akas_rows, crew_rows, principals_rows, ratings_rows = (
        [], [], [], [], []
    )
    for i, tid in enumerate(title_ids):
        ttype = rng.choice(TYPES)
        year = rng.randint(1995, 2026) if rng.random() > 0.08 else None
        runtime = rng.choice([15, 45, 95, 200]) if rng.random() > 0.2 else None
        genres = ",".join(rng.sample(GENRES, rng.randint(1, 3))) if rng.random() > 0.04 else None
        is_adult = rng.choice(["0"] * 16 + ["1", "2024"])  # mostly 0, some junk
        basics_rows.append(
            [tid, ttype, f"Title {i}", f"Original {i}", is_adult,
             year, None, runtime, genres]
        )
        # ~85% of titles have akas rows (missing => left-join NULL path)
        if rng.random() < 0.85:
            for k in range(rng.randint(1, 4)):
                akas_rows.append(
                    [tid, k + 1, f"Aka {i}-{k}",
                     rng.choice(REGIONS) if rng.random() > 0.2 else None,
                     None, None, None, 1 if k == 0 else 0]
                )
        # ~80% have crew; directors/writers drawn with the prefix pair
        # over-sampled so both ids appear in many lists
        if rng.random() < 0.8:
            directors = rng.sample(people_ids[:40], rng.randint(1, 3))
            writers = rng.sample(people_ids[:60], rng.randint(1, 3))
            crew_rows.append(
                [tid,
                 ",".join(directors) if rng.random() > 0.2 else None,
                 ",".join(writers) if rng.random() > 0.25 else None]
            )
        if rng.random() < 0.9:
            for k in range(rng.randint(2, 6)):
                principals_rows.append(
                    [tid, k + 1, rng.choice(people_ids),
                     rng.choice(CATEGORIES), None,
                     '["Self"]' if rng.random() < 0.3 else None]
                )
        # ~60% rated; votes straddle the >=100 filter; two exact rating
        # duplicates guarantee top-N ties
        if rng.random() < 0.6:
            rating = round(rng.uniform(1.0, 10.0), 1)
            votes = rng.choice([20, 99, 100, 150, 5000, 100000])
            ratings_rows.append([tid, rating, votes])

    _tsv(
        f"{data_dir}/title_basics.tsv",
        ["tconst", "titleType", "primaryTitle", "originalTitle", "isAdult",
         "startYear", "endYear", "runtimeMinutes", "genres"],
        basics_rows,
    )
    _tsv(
        f"{data_dir}/title_akas.tsv",
        ["titleId", "ordering", "title", "region", "language", "types",
         "attributes", "isOriginalTitle"],
        akas_rows,
    )
    _tsv(f"{data_dir}/title_crew.tsv",
         ["tconst", "directors", "writers"], crew_rows)
    _tsv(
        f"{data_dir}/title_principals.tsv",
        ["tconst", "ordering", "nconst", "category", "job", "characters"],
        principals_rows,
    )
    _tsv(f"{data_dir}/title_ratings.tsv",
         ["tconst", "averageRating", "numVotes"], ratings_rows)
