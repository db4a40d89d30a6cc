"""Decode dimension tables (O9) — genre-id/name mappings.

These are *data* observed in the reference's behavior (the constant decode
dicts at ``Common.py:32-58`` and ``Common.py:60-77``), reproduced here as
broadcast-joinable dimension tables.  In the rebuilt engine the lookup is a
broadcast hash join (or an inlined ``map`` literal) instead of a Python dict
access inside a row loop.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

# Akwam numeric genre id -> English name (Common.py:32-58)
AKWAM_GENRES: dict[str, str] = {
    "87": "Ramadan", "30": "Animated", "18": "Action", "71": "Dubbed",
    "72": "Netflix", "20": "Comedy", "35": "Thriller", "34": "Mystery",
    "33": "Family", "88": "Kids", "32": "Sports", "25": "War",
    "89": "Short", "43": "Fantasy", "24": "Science Fiction",
    "31": "Musical", "29": "Biography", "28": "Documentary",
    "27": "Romance", "26": "History", "23": "Drama", "22": "Horror",
    "21": "Crime", "19": "Adventure", "91": "Western",
}

# CimaNow Arabic genre -> English name (Common.py:60-77)
CIMA_NOW_GENRES: dict[str, str] = {
    "تشويق": "Suspense", "درامي": "Drama", "اكشن": "Action",
    "رعب": "Horror", "كوميدى": "Comedy", "مغامرة": "Adventure",
    "ترفيهي": "Entertainment", "غنائي": "Musical",
    "مسابقات": "Competitions", "اجتماعي": "Social", "جريمة": "Crime",
    "اثارة": "Thriller", "رومانسى": "Romance", "عائلي": "Family",
    "كوميدي": "Comedy", "درامى": "Drama",
}

# Placeholder image URL used by the reference when no poster exists or the
# upload fails (Common.py:229,254).
PLACEHOLDER_IMAGE = "https://imgpile.com/images/TPDrVl.jpg"


def akwam_genres_df(spark: SparkSession) -> DataFrame:
    return spark.createDataFrame(
        list(AKWAM_GENRES.items()), "genre_id string, genre_name string"
    )


def cimanow_genres_df(spark: SparkSession) -> DataFrame:
    return spark.createDataFrame(
        list(CIMA_NOW_GENRES.items()), "genre_ar string, genre_name string"
    )
