"""Trigram-profile language ID (textstats.lang_profiles_df / lang_id_df):
accuracy on a planted multilingual fixture — the measurement the synthetic
documents table cannot provide (its lang labels are content-uncorrelated).
The QUALITY.md langid row reproduces this via scripts/quality_report.py."""

from pyspark.sql import functions as F

from nmalign_spark.operators.textstats import lang_id_df, lang_profiles_df

# Stopword/function-word-heavy sentences per language — the signal real
# char-n-gram langid models key on.  8 per language: 4 train, 4 held out.
_SENTENCES = {
    "en": [
        "the quick brown fox jumps over the lazy dog and runs into the woods",
        "she said that they would have been there before the end of the day",
        "it is not what you know but who you know that matters in the end",
        "there are many things which we cannot change and some that we can",
        "this is the house that jack built with his own two hands last year",
        "when the rain stops we will go outside and walk along the river",
        "nobody knew why the lights were still on in the old empty house",
        "you should always check the weather before you leave in the morning",
    ],
    "de": [
        "der schnelle braune fuchs springt über den faulen hund und läuft in den wald",
        "sie sagte dass sie vor dem ende des tages dort gewesen wären",
        "es ist nicht was du weißt sondern wen du kennst das am ende zählt",
        "es gibt viele dinge die wir nicht ändern können und einige die wir können",
        "das ist das haus das jakob letztes jahr mit seinen eigenen händen gebaut hat",
        "wenn der regen aufhört gehen wir nach draußen und spazieren am fluss entlang",
        "niemand wusste warum das licht im alten leeren haus noch brannte",
        "du solltest immer das wetter prüfen bevor du morgens das haus verlässt",
    ],
    "fr": [
        "le renard brun et rapide saute par dessus le chien paresseux et court dans les bois",
        "elle a dit qu'ils y seraient arrivés avant la fin de la journée",
        "ce n'est pas ce que tu sais mais qui tu connais qui compte à la fin",
        "il y a beaucoup de choses que nous ne pouvons pas changer et quelques unes que nous pouvons",
        "c'est la maison que jacques a construite de ses propres mains l'année dernière",
        "quand la pluie s'arrête nous irons dehors et marcherons le long de la rivière",
        "personne ne savait pourquoi les lumières étaient encore allumées dans la vieille maison vide",
        "tu devrais toujours vérifier la météo avant de partir le matin",
    ],
    "es": [
        "el rápido zorro marrón salta sobre el perro perezoso y corre hacia el bosque",
        "ella dijo que habrían llegado allí antes del final del día",
        "no es lo que sabes sino a quién conoces lo que importa al final",
        "hay muchas cosas que no podemos cambiar y algunas que sí podemos",
        "esta es la casa que construyó santiago con sus propias manos el año pasado",
        "cuando pare la lluvia saldremos afuera y caminaremos junto al río",
        "nadie sabía por qué las luces seguían encendidas en la vieja casa vacía",
        "siempre deberías comprobar el tiempo antes de salir por la mañana",
    ],
}


def planted_fixture(spark):
    train, test = [], []
    i = 0
    for lang, sents in _SENTENCES.items():
        for j, s in enumerate(sents):
            (train if j < 4 else test).append((i, lang, s))
            i += 1
    mk = lambda rows: spark.createDataFrame(  # noqa: E731
        rows, "doc_id long, lang string, text string")
    return mk(train), mk(test)


def test_langid_accuracy_on_planted_multilingual_fixture(spark):
    train, test = planted_fixture(spark)
    profiles = lang_profiles_df(train)
    guessed = lang_id_df(test.select("doc_id", "text"), profiles)
    scored = guessed.join(test.select("doc_id", F.col("lang").alias("truth")),
                          "doc_id")
    rows = scored.collect()
    assert len(rows) == 16
    acc = sum(r.lang_guess == r.truth for r in rows) / len(rows)
    assert acc >= 0.9, [(r.doc_id, r.truth, r.lang_guess) for r in rows
                        if r.lang_guess != r.truth]


def test_langid_no_profile_hit_is_und(spark):
    train, _ = planted_fixture(spark)
    profiles = lang_profiles_df(train)
    oov = spark.createDataFrame([(99, "0101 ### 0101")],
                                "doc_id long, text string")
    row = lang_id_df(oov, profiles).collect()[0]
    assert row.lang_guess == "und" and row.n_hits == 0
