"""Host spam signals (X244): per-signal arithmetic, vote thresholds,
clean hosts pass, NULL/empty tolerated."""


def test_url_spam_signals(spark):
    from corpusama_spark.functions.urls import url_spam_score

    urls = spark.createDataFrame(
        [
            (1, "https://www.example.org/page"),
            (2, "http://a.b.c.d.e.farm.tk/x"),          # deep + spammy tld
            (3, "https://win-free-money-now-2024.top/"),  # hyphens + tld
            (4, "https://xn--pypal-4ve.com/login"),       # punycode
            (5, "https://cdn1234567.example.org/i.png"),  # digits only
            (6, None),
        ],
        "id long, url string",
    )
    out = {r.id: r for r in url_spam_score(urls).collect()}

    r1 = out[1]
    assert r1.spam_points == 0 and not r1.is_spammy_host
    assert r1.n_labels == 3 and r1.digit_share == 0.0

    r2 = out[2]
    assert r2.n_labels == 7 and r2.spammy_tld
    assert r2.spam_points >= 2 and r2.is_spammy_host

    r3 = out[3]
    assert r3.n_hyphens == 4 and r3.spammy_tld
    # digit share: host "win-free-money-now-2024.top" nondot has 4 digits
    nondot = "win-free-money-now-2024top"
    assert r3.digit_share == round(4 / len(nondot), 6)
    assert r3.is_spammy_host

    r4 = out[4]
    assert r4.is_punycode and r4.spam_points == 1 and not r4.is_spammy_host

    r5 = out[5]
    assert r5.digit_share == round(7 / len("cdn1234567exampleorg"), 6)
    assert r5.spam_points == 1 and not r5.is_spammy_host

    # NULL url: host NULL, all-zero signals, not spammy
    r6 = out[6]
    assert r6.spam_points == 0 and not r6.is_spammy_host
