"""Embedded multilingual seed sentences.

Shared by: the synthetic captions generator (deterministic test/bench data),
the trigram language-ID model (training profiles), and the character n-gram
perplexity scorer (training corpus). Humanitarian-report register mirrors the
reference's ReliefWeb domain (README.md:5) without copying any of its text.

Only public, self-authored sentences — no external data.
"""

SEED_SENTENCES = {
    "en": [
        "The distribution of emergency food supplies continued throughout the week.",
        "Local authorities reported severe flooding across three coastal provinces.",
        "Humanitarian access to the affected region remains extremely limited.",
        "Thousands of families have been displaced by the ongoing drought.",
        "The response plan requires additional funding to reach remote communities.",
        "Health workers vaccinated children against measles in the northern camps.",
        "Road conditions deteriorated after heavy rains damaged the main bridge.",
        "Clean drinking water is now available at twelve distribution points.",
        "The assessment team visited shelters hosting displaced households.",
        "Partners delivered blankets and hygiene kits to the mountain villages.",
        "Schools reopened this month after repairs to damaged classrooms.",
        "Farmers received seeds and tools ahead of the planting season.",
        "The earthquake destroyed hundreds of homes near the provincial capital.",
        "Relief agencies warned of rising malnutrition among young children.",
        "Security constraints delayed the convoy for several days.",
    ],
    "fr": [
        "La distribution des vivres d'urgence s'est poursuivie toute la semaine.",
        "Les autorités locales ont signalé de graves inondations dans trois provinces.",
        "L'accès humanitaire à la région touchée reste extrêmement limité.",
        "Des milliers de familles ont été déplacées par la sécheresse persistante.",
        "Le plan de réponse nécessite un financement supplémentaire pour les zones reculées.",
        "Les agents de santé ont vacciné les enfants contre la rougeole dans les camps.",
        "Les routes se sont dégradées après que les pluies ont endommagé le pont principal.",
        "L'eau potable est désormais disponible dans douze points de distribution.",
        "L'équipe d'évaluation a visité les abris accueillant les ménages déplacés.",
        "Les partenaires ont livré des couvertures et des kits d'hygiène aux villages.",
        "Les écoles ont rouvert ce mois-ci après la réparation des salles de classe.",
        "Les agriculteurs ont reçu des semences et des outils avant la saison des semis.",
        "Le séisme a détruit des centaines de maisons près de la capitale provinciale.",
        "Les agences humanitaires alertent sur la montée de la malnutrition infantile.",
        "Les contraintes de sécurité ont retardé le convoi pendant plusieurs jours.",
    ],
    "es": [
        "La distribución de alimentos de emergencia continuó durante toda la semana.",
        "Las autoridades locales informaron de graves inundaciones en tres provincias.",
        "El acceso humanitario a la región afectada sigue siendo muy limitado.",
        "Miles de familias han sido desplazadas por la sequía persistente.",
        "El plan de respuesta necesita fondos adicionales para las zonas remotas.",
        "El personal de salud vacunó a los niños contra el sarampión en los campamentos.",
        "Las carreteras se deterioraron después de que las lluvias dañaran el puente.",
        "El agua potable ya está disponible en doce puntos de distribución.",
        "El equipo de evaluación visitó los refugios que acogen a las familias.",
        "Los socios entregaron mantas y kits de higiene a las aldeas de montaña.",
        "Las escuelas reabrieron este mes tras la reparación de las aulas dañadas.",
        "Los agricultores recibieron semillas y herramientas antes de la siembra.",
        "El terremoto destruyó cientos de viviendas cerca de la capital provincial.",
        "Las agencias de ayuda advirtieron sobre el aumento de la desnutrición infantil.",
        "Las restricciones de seguridad retrasaron el convoy durante varios días.",
    ],
    "de": [
        "Die Verteilung von Nothilfegütern wurde die ganze Woche über fortgesetzt.",
        "Die örtlichen Behörden meldeten schwere Überschwemmungen in drei Provinzen.",
        "Der humanitäre Zugang zur betroffenen Region bleibt äußerst eingeschränkt.",
        "Tausende Familien wurden durch die anhaltende Dürre vertrieben.",
        "Der Hilfsplan benötigt zusätzliche Mittel für abgelegene Gemeinden.",
        "Gesundheitshelfer impften Kinder in den nördlichen Lagern gegen Masern.",
        "Die Straßen verschlechterten sich, nachdem Regen die Hauptbrücke beschädigte.",
        "Sauberes Trinkwasser ist jetzt an zwölf Verteilstellen verfügbar.",
        "Das Bewertungsteam besuchte Unterkünfte mit vertriebenen Haushalten.",
        "Die Partner lieferten Decken und Hygienesets in die Bergdörfer.",
        "Die Schulen öffneten diesen Monat nach der Reparatur der Klassenzimmer.",
        "Die Bauern erhielten Saatgut und Werkzeuge vor der Pflanzsaison.",
        "Das Erdbeben zerstörte Hunderte von Häusern nahe der Provinzhauptstadt.",
        "Hilfsorganisationen warnten vor zunehmender Unterernährung bei Kindern.",
        "Sicherheitsprobleme verzögerten den Konvoi um mehrere Tage.",
    ],
}

LANGS = sorted(SEED_SENTENCES)

# mild toxicity lexicon for the scrub stage (placeholder terms, clearly fake)
TOXIC_TERMS = ["darnfool", "scumblewit", "gorramit", "frakking"]

PII_SAMPLES = [
    "contact john.doe@example.org for details",
    "call +1 555 123 4567 during office hours",
    "see https://www.example.com/reports/2023 for the annex",
    "IP logged at 192.168.12.34 yesterday",
    "passport no. AB1234567 was verified",
]
